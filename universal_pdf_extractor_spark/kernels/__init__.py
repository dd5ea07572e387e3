"""Pure parity kernels (no Spark imports).

Each module reimplements one operator family of the reference
(see SURVEY.md §2) as deterministic, seedable, wall-clock-free
functions suitable for use inside Arrow-batched pandas UDFs.
"""
