"""optbinning_spark — a PySpark-native optimal-binning / scorecard
analytics engine with the query surface of
guillermo-navas-palencia/optbinning, re-architected Spark-first.

Data plane: DataFrame expressions + single-shuffle grouped
aggregations (partial/final hash agg = the reference's sketch
add/merge contract). Driver plane: exact DP solver replacing CP-SAT.
"""

from .binning import ContinuousOptimalBinning, OptimalBinning
from .session import get_spark

__all__ = [
    "OptimalBinning",
    "ContinuousOptimalBinning",
    "MulticlassOptimalBinning",
    "BinningProcess",
    "Scorecard",
    "get_spark",
]

__version__ = "0.1.0"


def __getattr__(name):
    # lazy imports to keep `import optbinning_spark` light
    if name == "BinningProcess":
        from .binning_process import BinningProcess

        return BinningProcess
    if name == "Scorecard":
        from .scorecard import Scorecard

        return Scorecard
    if name == "MulticlassOptimalBinning":
        from .multiclass_binning import MulticlassOptimalBinning

        return MulticlassOptimalBinning
    raise AttributeError(name)
