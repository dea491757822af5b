"""Research/analysis harness: Hessian spectra, interpolation, MetaInit,
mask visualization."""

from rigl_tpu.analysis.hessian import (
    lanczos_spectrum,
    sparse_hessian,
    sparse_hessian_spectrum,
)
from rigl_tpu.analysis.interpolate import interpolate_losses, interpolate_params
from rigl_tpu.analysis.metainit import gradient_quotient, meta_init
