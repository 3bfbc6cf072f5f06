"""Pure, vectorized kernels — no Ray imports at module scope.

Every function here is numpy/pyarrow-vectorized and deterministic so it can
run inside ``map_batches`` on any worker with no per-batch setup cost.
"""
