"""SPSC ring buffer: ctypes binding to the native C++ implementation.

The native library (``native/ringbuf.cpp``) is compiled on first use with
g++ and cached next to the source; a pure-Python fallback (deque of frames,
GIL-atomic) keeps the engine functional without a toolchain.

This is the ``rtrb`` analog (SURVEY component #14): the jitter absorber
between the device render thread and the paced stream thread.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading

import numpy as np

log = logging.getLogger(__name__)

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "native")
_SRCS = [
    os.path.join(_NATIVE_DIR, "ringbuf.cpp"),
    os.path.join(_NATIVE_DIR, "consumer.cpp"),
    os.path.join(_NATIVE_DIR, "lpc.cpp"),
    os.path.join(_NATIVE_DIR, "crc.cpp"),
]
_SO = os.path.join(_NATIVE_DIR, "libfwnative.so")

_lib = None
_lib_lock = threading.Lock()


def _load_native():
    """Compile (if needed) and load the native library; None on failure."""
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        try:
            if (not os.path.exists(_SO)) or any(
                os.path.getmtime(_SO) < os.path.getmtime(src)
                for src in _SRCS
            ):
                # build to a temp name + atomic rename: concurrent engine
                # startups must never dlopen a partially written .so
                tmp_so = f"{_SO}.{os.getpid()}.tmp"
                subprocess.run(
                    [
                        "g++",
                        "-O2",
                        "-shared",
                        "-fPIC",
                        "-std=c++17",
                        *_SRCS,
                        "-o",
                        tmp_so,
                        "-lpthread",
                    ],
                    check=True,
                    capture_output=True,
                )
                os.replace(tmp_so, _SO)
            lib = ctypes.CDLL(_SO)
            lib.rb_create.restype = ctypes.c_void_p
            lib.rb_create.argtypes = [ctypes.c_size_t]
            lib.rb_destroy.argtypes = [ctypes.c_void_p]
            lib.rb_capacity.restype = ctypes.c_size_t
            lib.rb_capacity.argtypes = [ctypes.c_void_p]
            lib.rb_readable.restype = ctypes.c_size_t
            lib.rb_readable.argtypes = [ctypes.c_void_p]
            lib.rb_writable.restype = ctypes.c_size_t
            lib.rb_writable.argtypes = [ctypes.c_void_p]
            for fn in (lib.rb_write, lib.rb_read):
                fn.restype = ctypes.c_size_t
                fn.argtypes = [
                    ctypes.c_void_p,
                    ctypes.POINTER(ctypes.c_float),
                    ctypes.c_size_t,
                ]
            lib.rb_skip.restype = ctypes.c_size_t
            lib.rb_skip.argtypes = [ctypes.c_void_p, ctypes.c_size_t]
            lib.consumer_start.restype = ctypes.c_void_p
            lib.consumer_start.argtypes = [
                ctypes.c_void_p,
                ctypes.c_void_p,
                ctypes.c_double,
                ctypes.c_size_t,
            ]
            lib.consumer_stop.argtypes = [ctypes.c_void_p]
            for fn in (lib.consumer_periods, lib.consumer_underflows):
                fn.restype = ctypes.c_uint64
                fn.argtypes = [ctypes.c_void_p]
            lib.consumer_take_underflow.restype = ctypes.c_uint32
            lib.consumer_take_underflow.argtypes = [ctypes.c_void_p]
            lib.consumer_last_late_ns.restype = ctypes.c_int64
            lib.consumer_last_late_ns.argtypes = [ctypes.c_void_p]
            lib.flac_lpc.restype = None
            lib.flac_lpc.argtypes = [
                ctypes.POINTER(ctypes.c_int64),
                ctypes.c_size_t,
                ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_int64),
                ctypes.c_size_t,
                ctypes.POINTER(ctypes.c_int64),
            ]
            _lib = lib
        except Exception as e:  # pragma: no cover - toolchain-dependent
            log.warning("native ring buffer unavailable (%s); using fallback", e)
            _lib = False
        return _lib


class RingBuffer:
    """SPSC float32 ring buffer (native-backed when possible)."""

    def __init__(self, capacity: int, force_python: bool = False):
        self._native = None
        lib = None if force_python else _load_native()
        if lib:
            self._lib = lib
            self._native = ctypes.c_void_p(lib.rb_create(capacity))
            if not self._native:
                raise MemoryError("rb_create failed")
            self._capacity = int(lib.rb_capacity(self._native))
        else:
            # Fallback: contiguous numpy ring guarded by a lock (still
            # bounded + wait-free in practice; only used without g++).
            cap = 1
            while cap < max(capacity, 2):
                cap <<= 1
            self._capacity = cap
            self._buf = np.zeros(cap, np.float32)
            self._head = 0
            self._tail = 0
            self._lock = threading.Lock()

    # -- introspection --------------------------------------------------------
    @property
    def capacity(self) -> int:
        return self._capacity

    def readable(self) -> int:
        if self._native:
            return int(self._lib.rb_readable(self._native))
        with self._lock:
            return self._tail - self._head

    def writable(self) -> int:
        if self._native:
            return int(self._lib.rb_writable(self._native))
        with self._lock:
            return self._capacity - (self._tail - self._head)

    @property
    def is_native(self) -> bool:
        return self._native is not None

    # -- data path ------------------------------------------------------------
    def write(self, data: np.ndarray) -> int:
        """Write up to len(data) floats; returns the count written."""
        data = np.ascontiguousarray(data, np.float32)
        n = data.size
        if self._native:
            ptr = data.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
            return int(self._lib.rb_write(self._native, ptr, n))
        with self._lock:
            free = self._capacity - (self._tail - self._head)
            n = min(n, free)
            if n == 0:
                return 0
            start = self._tail & (self._capacity - 1)
            first = min(n, self._capacity - start)
            self._buf[start : start + first] = data.reshape(-1)[:first]
            if first < n:
                self._buf[: n - first] = data.reshape(-1)[first:n]
            self._tail += n
            return n

    def read(self, out: np.ndarray) -> int:
        """Read up to out.size floats into ``out``; returns the count read."""
        assert out.dtype == np.float32 and out.flags["C_CONTIGUOUS"]
        n = out.size
        if self._native:
            ptr = out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
            return int(self._lib.rb_read(self._native, ptr, n))
        with self._lock:
            avail = self._tail - self._head
            n = min(n, avail)
            if n == 0:
                return 0
            start = self._head & (self._capacity - 1)
            first = min(n, self._capacity - start)
            flat = out.reshape(-1)
            flat[:first] = self._buf[start : start + first]
            if first < n:
                flat[first:n] = self._buf[: n - first]
            self._head += n
            return n

    def skip(self, n: int) -> int:
        if self._native:
            return int(self._lib.rb_skip(self._native, n))
        with self._lock:
            avail = self._tail - self._head
            n = min(n, avail)
            self._head += n
            return n

    def __del__(self):
        if getattr(self, "_native", None):
            try:
                self._lib.rb_destroy(self._native)
            except Exception:
                pass
            self._native = None


class NativeConsumer:
    """Hard-realtime paced consumer running in native code.

    The C++ thread (``native/consumer.cpp``) paces itself with absolute
    deadlines, reads one stream buffer per period from ``in_ring`` and
    forwards it to ``out_ring`` (drained to the sink by the host off the
    realtime path).  Replaces the Python paced thread when the toolchain is
    available — the pacing loop then carries no GIL jitter.

    Only constructible when both rings are native (``RingBuffer.is_native``).
    """

    def __init__(
        self,
        in_ring: "RingBuffer",
        out_ring: "RingBuffer | None",
        period_secs: float,
        floats_per_period: int,
    ):
        lib = _load_native()
        if not lib or not in_ring.is_native or (
            out_ring is not None and not out_ring.is_native
        ):
            raise RuntimeError("native consumer requires native ring buffers")
        self._lib = lib
        # keep the rings alive as long as the consumer thread runs
        self._in_ring = in_ring
        self._out_ring = out_ring
        self._handle = ctypes.c_void_p(
            lib.consumer_start(
                in_ring._native,
                out_ring._native if out_ring is not None else None,
                float(period_secs),
                int(floats_per_period),
            )
        )
        if not self._handle:
            raise MemoryError("consumer_start failed")

    @property
    def periods(self) -> int:
        h = self._handle
        return int(self._lib.consumer_periods(h)) if h else 0

    @property
    def underflows(self) -> int:
        h = self._handle
        return int(self._lib.consumer_underflows(h)) if h else 0

    def take_underflow(self) -> bool:
        """Sticky underflow flag; reading clears it."""
        h = self._handle
        return bool(self._lib.consumer_take_underflow(h)) if h else False

    @property
    def last_late_ns(self) -> int:
        h = self._handle
        return int(self._lib.consumer_last_late_ns(h)) if h else 0

    def stop(self):
        if getattr(self, "_handle", None):
            self._lib.consumer_stop(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.stop()
        except Exception:
            pass
