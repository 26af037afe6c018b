"""Native (C++) runtime components, loaded via ctypes.

Built on demand with the in-tree g++ toolchain and cached by source
hash; every native path has a pure-Python fallback so the framework
works without a compiler (set VSC2022_TPU_NO_NATIVE=1 to force the
fallback)."""

from vsc2022_tpu.native.build import get_library, native_available  # noqa: F401
