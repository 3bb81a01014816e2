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


_LAZY = {
    "BinningProcess": ("optbinning_spark.binning_process", "BinningProcess"),
    "Scorecard": ("optbinning_spark.scorecard", "Scorecard"),
    "ScorecardMonitoring": ("optbinning_spark.monitoring", "ScorecardMonitoring"),
    "MulticlassOptimalBinning": (
        "optbinning_spark.multiclass_binning",
        "MulticlassOptimalBinning",
    ),
    "OptimalBinning2D": ("optbinning_spark.binning_2d", "OptimalBinning2D"),
    "ContinuousOptimalBinning2D": (
        "optbinning_spark.binning_2d",
        "ContinuousOptimalBinning2D",
    ),
    "OptimalPWBinning": ("optbinning_spark.piecewise", "OptimalPWBinning"),
    "ContinuousOptimalPWBinning": (
        "optbinning_spark.piecewise",
        "ContinuousOptimalPWBinning",
    ),
    "OptimalBinningSketch": (
        "optbinning_spark.streaming.sketch",
        "OptimalBinningSketch",
    ),
    "BinningProcessSketch": (
        "optbinning_spark.streaming.sketch",
        "BinningProcessSketch",
    ),
    "RangeDetector": ("optbinning_spark.operators.outlier", "RangeDetector"),
    "ModifiedZScoreDetector": (
        "optbinning_spark.operators.outlier",
        "ModifiedZScoreDetector",
    ),
    "YQuantileDetector": ("optbinning_spark.operators.outlier", "YQuantileDetector"),
    "Counterfactual": ("optbinning_spark.counterfactual", "Counterfactual"),
    "SBOptimalBinning": ("optbinning_spark.scenario_binning", "SBOptimalBinning"),
    "MDLP": ("optbinning_spark.mdlp", "MDLP"),
}

__all__ = __all__ + [k for k in _LAZY if k not in __all__]


def __getattr__(name):
    # lazy imports to keep `import optbinning_spark` light
    if name in _LAZY:
        import importlib

        mod, attr = _LAZY[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(name)
