from .wpd import WPDCalculator
from .rgc import RGCCalculator
from .ipe import IPECalculator
from .base_metric import get_onsets_from_file

__all__ = ["WPDCalculator", "RGCCalculator", "IPECalculator", "get_onsets_from_file"]
