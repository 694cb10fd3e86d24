"""Parameters and CRS (mirrors ``/root/reference/src/params/mod.rs``)."""
from .ring import RingPlan, get_ring
from .parameters import PvwParameters, PvwParametersBuilder
from .crs import PvwCrs
from . import presets

__all__ = ["RingPlan", "get_ring", "PvwParameters", "PvwParametersBuilder", "PvwCrs", "presets"]
