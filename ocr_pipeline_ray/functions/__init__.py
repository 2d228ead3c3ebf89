"""Pure, deterministic scalar/vector kernels (SURVEY §2.6).

Everything in this package is side-effect free and batch-oriented:
functions take/return numpy arrays, lists of strings, or scalars, and
are called from inside ``map_batches`` UDFs. Regexes and rule tables
are compiled once at import (the reference compiles its banks at
module import too, pipeline.py:2071-2090).
"""
