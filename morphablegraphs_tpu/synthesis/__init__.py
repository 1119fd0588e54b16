"""Synthesis runtime: graph-walk scan, planners, optimizers, post-processing."""

from . import walk
from . import generator
from . import action_builder
from . import motion_generator
