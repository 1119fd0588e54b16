"""Numeric kernels (jit/vmap/Pallas) replacing the reference's scipy/sklearn hot loops."""

from . import quat
from . import bspline
from . import gmm
from . import timewarp
