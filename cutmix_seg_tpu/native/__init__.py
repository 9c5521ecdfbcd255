"""Native (C++) host-runtime components.

`decode` wraps the C++ PNG/JPEG decoder (decode.cpp, libpng + libjpeg-turbo)
behind a ctypes interface with a transparent PIL fallback. The shared library
is compiled on first use with the system toolchain and cached under
``~/.cache/cutmix_seg_tpu/native/`` keyed by the source hash, so editing the
C++ invalidates the cache automatically and fresh checkouts need no build
step. Set ``CUTMIX_SEG_NATIVE_DECODE=0`` to force the PIL path.
"""

from cutmix_seg_tpu.native.decode import (  # noqa: F401
    decode_array,
    encode_png,
    native_available,
)
