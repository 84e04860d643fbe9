"""Physical-plan concerns: session tuning, partitioning, checkpoint/resume."""
