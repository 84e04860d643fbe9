"""Pure-Python, deterministic extraction kernels.

These functions define the golden semantics: they are byte-stable,
seedless, and are what the vectorized Spark operators must reproduce
exactly. They run inside Arrow-batched pandas UDFs on executors.
"""
