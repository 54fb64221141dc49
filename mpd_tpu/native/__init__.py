"""Native (C++) components, driven via ctypes.

The shared library is built on first import with g++ -O3 (no pybind11 in the
image; ctypes keeps the binding surface minimal). If the toolchain is
unavailable the callers fall back to the pure-Python implementations.
"""

from mpd_tpu.native.build import load_library, native_available
from mpd_tpu.native.rrt import NativeRRTConnect, native_collision_fn
