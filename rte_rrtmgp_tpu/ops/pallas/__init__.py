"""Pallas TPU kernels for the hot gas-optics ops."""

from .interp_kernel import (interp_cellw_multi,  # noqa: F401
                            interp_rows_multi, interp_rows_pallas,
                            kernel_opts)
