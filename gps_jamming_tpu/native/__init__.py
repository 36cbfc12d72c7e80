"""Native (C++) runtime components, bound via ctypes.

The compute path is JAX/XLA on device; these are the host-side runtime
pieces the reference implements in C (ring buffer, byte conversion) —
rebuilt as a C++ shared library compiled on first use with the baked-in
toolchain (no pybind11 in this environment; plain C ABI + ctypes).
"""
from .reader import CaptureReader, native_available  # noqa: F401
