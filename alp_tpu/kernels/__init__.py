"""Pallas TPU kernel layer: tile layout, FFOR pack/unpack, fused falp."""

from . import layout
from . import falp
