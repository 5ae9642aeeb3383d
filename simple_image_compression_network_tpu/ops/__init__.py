"""Compute ops: exact-integer goldens, XLA/Pallas conv kernels, capability-
parity NN ops, GDN."""

from . import conv_int, conv_fast, integer  # noqa: F401
