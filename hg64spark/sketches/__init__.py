"""Companion mergeable sketches (north_rule): HLL distinct-count, count-min
heavy hitters, Bloom membership, KLL rank/quantile.  All share the serde
envelope (`hg64spark.serde`), the sketch protocol used by `hg64spark.agg`
(``add_values`` / ``merge`` / ``serialize``), and published error bounds
asserted by the test suite.
"""

from hg64spark.sketches.hll import HLL
from hg64spark.sketches.cms import CMS
from hg64spark.sketches.bloom import Bloom
from hg64spark.sketches.kll import KLL
from hg64spark.sketches.tdigest import TDigest
from hg64spark.sketches.mg import MG

__all__ = ["HLL", "CMS", "Bloom", "KLL", "TDigest", "MG"]
