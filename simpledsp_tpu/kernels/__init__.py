"""Pallas TPU kernels for hot paths."""

from simpledsp_tpu.kernels.fft import (
    fft_frames_ri,
    pallas_fft_supported,
    rfft_frames,
)
