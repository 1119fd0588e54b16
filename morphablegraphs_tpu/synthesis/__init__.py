"""Synthesis runtime: graph-walk scan, planners, optimizers, post-processing."""

from . import walk
