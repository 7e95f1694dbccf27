"""Pallas TPU kernels for the hot loss paths (CTC / RNN-T forward-backward).

These are the TPU-native replacements for the reference's external
warp-ctc / warp-transducer CUDA ops. Each kernel computes the full
forward-backward DP and analytic gradients in a single on-chip pass —
no per-diagonal kernel dispatch, alpha/beta live in VMEM.
"""
