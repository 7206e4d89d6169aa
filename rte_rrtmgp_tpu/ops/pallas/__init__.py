"""Pallas TPU kernels for the hot gas-optics ops."""

from .interp_kernel import (interp_rows_multi, interp_rows_pallas,  # noqa: F401
                            kernel_opts)
