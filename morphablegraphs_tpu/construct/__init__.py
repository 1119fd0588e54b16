"""Offline construction (training): DTW alignment, fPCA, GMM-EM, model export
(reference construction/ package, SURVEY.md §2.5)."""

from . import dtw
from . import fpca
from . import gmm_trainer
from . import constructor
