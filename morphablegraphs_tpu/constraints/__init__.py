"""Constraint system: input JSON parsing, per-step compiled constraint sets,
vectorized evaluation (reference constraints/ package, SURVEY.md §2.3)."""

from . import input_reader
from . import compiled
