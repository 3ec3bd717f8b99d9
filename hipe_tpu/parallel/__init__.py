"""Work partitioning and SPMD sharding strategies.

Approach 1 (image-level) -> :mod:`hipe_tpu.parallel.image_level`
Approach 2 (row-split + halo) -> :mod:`hipe_tpu.parallel.row_split`
Shared geometry/ratio math -> :mod:`hipe_tpu.parallel.partitioner`
"""
