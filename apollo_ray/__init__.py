"""apollo_ray — a Ray-Data-native near-duplicate detection + clustering engine.

A from-scratch reimplementation of the *semantics* of src-d/apollo
(weighted bags -> Weighted MinHash -> LSH banding -> buckets -> connected
components -> communities -> reports) re-expressed as streaming
``ray.data.Dataset`` pipelines over zero-copy Arrow batches, with actor
pools for stateful stages and explicit shuffle/skew handling.

The reference's execution substrate (PySpark + Cassandra + CUDA + driver
RAM graphs) is replaced wholesale; what is preserved is what apollo
*computes* (see SURVEY.md for the file:line parity map).
"""

from apollo_ray.config import DedupConfig

__version__ = "0.1.0"
__all__ = ["DedupConfig"]
