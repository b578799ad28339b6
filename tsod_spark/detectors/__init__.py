from .base import SparkDetector, as_tsf
from .combined import CombinedDetector
from .constant import ConstantGradientDetector, ConstantValueDetector
from .diff import DiffDetector
from .gradient import GradientDetector
from .hampel import HampelDetector
from .range import RangeDetector
from .rolling_std import RollingStandardDeviationDetector
from .seasonal import SeasonalResidualDetector

__all__ = [
    "SeasonalResidualDetector",
    "SparkDetector",
    "as_tsf",
    "CombinedDetector",
    "ConstantGradientDetector",
    "ConstantValueDetector",
    "DiffDetector",
    "GradientDetector",
    "HampelDetector",
    "RangeDetector",
    "RollingStandardDeviationDetector",
]
