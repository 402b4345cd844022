"""hg64spark — a PySpark-native mergeable sketch / approximate-aggregation library.

Built from scratch around the bucket scheme of fanf2/hg64 (a 64-bit log-linear
histogram: 6-bit exponent + configurable mantissa bits), re-expressed as
vectorized numpy kernels driven by Spark's DataFrame API:

    partial sketch per partition (mapInPandas, Arrow batches)
      -> shuffle of tiny serialized sketches, grouped by key
      -> associative integer merge + finalize (applyInPandas)

Companion mergeable sketches (HLL, count-min, KLL, Bloom) share one serialized
envelope (`serde.py`) and the same merge contract.

Reference semantics: /root/reference/hg64.{c,h} (fanf2/hg64, MPL-2.0).  This is
not a port — no code is shared; file:line citations in docstrings point at the
behavior each piece reproduces.
"""

from hg64spark.hg64 import HG64
from hg64spark import keymath, serde

__all__ = ["HG64", "keymath", "serde"]
__version__ = "0.1.0"
