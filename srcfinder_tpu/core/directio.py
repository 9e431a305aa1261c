"""O_DIRECT file reading for the streaming stages.

Why this exists (measured on the deployment VM, SCALING.md "Host
memory"): the guest kernel runs virtio free page reporting, and the
hypervisor re-fault tax applies to PAGE-CACHE allocation too — a cold
buffered read of the 2.8 GB benchmark cube ran at **13 MB/s** (220 s)
while the same read warm ran at 493 MB/s. ``O_DIRECT`` DMAs file data
straight into caller buffers (which the allocator shim,
native/alloccache.cpp, keeps resident), bypassing page-cache page
allocation entirely: the same cold read measured **640 MB/s** — 49x.

The reference streams through spectral/numpy memmaps
(robust_mf.py:207,297-298; masks_sds.py:289-296) and pays the page
cache; this module is the TPU framework's host-runtime replacement for
those reads. It is correctness-transparent: every path falls back to
buffered ``pread`` when O_DIRECT is unavailable (tmpfs, exotic
filesystems, alignment surprises) or when ``SRCFINDER_DIRECT_IO=0``.

Alignment contract (why the code looks the way it does): O_DIRECT
requires file offset, byte count, and destination address all aligned
to the logical block size (4096 covers every deployment target). Reads
therefore cover the aligned superset [align_down(offset),
align_up(offset+nbytes)) landing in a page-aligned buffer, and the
caller receives a zero-copy VIEW shifted by ``offset % 4096`` into it —
no bounce memcpy. Views are 4-byte aligned whenever ``offset`` is
(every ENVI sample offset is), which numpy requires for float32
reinterpretation.
"""

from __future__ import annotations

import os

import numpy as np

__all__ = ["DirectFile", "direct_io_enabled"]

_ALIGN = 4096
_SEG = 64 << 20          # bytes per preadv call (virtio-friendly)


def direct_io_enabled() -> bool:
    return (os.environ.get("SRCFINDER_DIRECT_IO", "1") != "0"
            and hasattr(os, "O_DIRECT"))


def _aligned_empty(nbytes: int) -> np.ndarray:
    """Page-aligned uint8 buffer. The allocator shim already returns
    page-aligned blocks for >= 4 MB asks, but alignment must not depend
    on the shim being loaded — over-allocate and slice."""
    raw = np.empty(nbytes + _ALIGN, np.uint8)
    off = (-raw.ctypes.data) % _ALIGN
    return raw[off:off + nbytes]


class DirectFile:
    """Positional reader with an O_DIRECT fast path.

    ``read_range(offset, nbytes)`` returns a uint8 array of exactly
    ``nbytes`` (a view into a fresh page-aligned buffer — the allocator
    shim recycles them warm). Thread-compatible: concurrent
    ``read_range`` calls are safe (``os.preadv`` is positional; no
    shared mutable state beyond the fd and the one-shot fallback flag).
    """

    def __init__(self, path: str):
        self.path = path
        self.size = os.path.getsize(path)
        self.direct = False
        self.fd = -1
        self._retired = []      # fds parked by _demote (see below)
        if direct_io_enabled():
            try:
                self.fd = os.open(path, os.O_RDONLY | os.O_DIRECT)
                self.direct = True
            except OSError:
                pass  # filesystem refuses O_DIRECT: buffered fallback
        if self.fd < 0:
            self.fd = os.open(path, os.O_RDONLY)

    # -- lifecycle ----------------------------------------------------
    def close(self, _close=os.close):
        # _close bound at def time: os.close may already be torn down
        # when __del__ runs at interpreter shutdown
        if self.fd >= 0:
            _close(self.fd)
            self.fd = -1
        while self._retired:
            _close(self._retired.pop())

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    # -- reads --------------------------------------------------------
    def _pread_full(self, mv: memoryview, offset: int) -> int:
        """Fill ``mv`` from ``offset`` in <= _SEG chunks; returns bytes
        read (short only at EOF)."""
        total = 0
        n = len(mv)
        while total < n:
            want = min(_SEG, n - total)
            got = os.preadv(self.fd, [mv[total:total + want]],
                            offset + total)
            if got <= 0:
                break
            total += got
        return total

    def _demote(self):
        """Reopen buffered after a runtime O_DIRECT failure. The old fd
        is PARKED, not closed: a concurrent read_range may be mid-preadv
        on it, and closing would hand its number to an unrelated open
        (silent wrong-file reads). One parked fd per demotion, closed in
        close() — bounded and harmless."""
        fd = os.open(self.path, os.O_RDONLY)
        self._retired.append(self.fd)
        self.fd = fd
        self.direct = False

    def read_range(self, offset: int, nbytes: int) -> np.ndarray:
        """Exactly ``nbytes`` from ``offset`` as uint8 (zero-filled past
        EOF, mirroring memmap-of-truncated-file semantics is NOT
        attempted: short files raise)."""
        if offset < 0 or offset + nbytes > self.size:
            raise ValueError(
                f"read [{offset}, {offset + nbytes}) outside "
                f"{self.path} (size {self.size})")
        if nbytes == 0:
            return np.empty(0, np.uint8)
        if self.direct:
            head = offset % _ALIGN
            off0 = offset - head
            span = head + nbytes
            span_al = -(-span // _ALIGN) * _ALIGN
            buf = _aligned_empty(span_al)
            try:
                got = self._pread_full(memoryview(buf), off0)
            except OSError:
                self._demote()
            else:
                if got >= span:
                    return buf[head:head + nbytes]
                if off0 + got >= offset + nbytes:  # EOF-truncated tail
                    return buf[head:head + nbytes]
                self._demote()  # unexpected short read: play it safe
        buf = np.empty(nbytes, np.uint8)
        got = self._pread_full(memoryview(buf), offset)
        if got < nbytes:
            raise IOError(
                f"short read: wanted {nbytes} at {offset}, got {got} "
                f"({self.path})")
        return buf

    def read_strided(self, offsets, nbytes: int) -> np.ndarray:
        """Gather equally-sized extents: returns (len(offsets), nbytes)
        uint8. The per-line band-window read pattern of the CMF
        (robust_mf.py:297-298 reads [:, b0:b1, :] of a BIL cube — one
        contiguous extent per line).

        Extents are coalesced (consecutive offsets whose gap equals the
        extent length collapse into one contiguous read), and ALL
        staging goes through one >= 4 MB bounce buffer per call so the
        allocator shim pools it — a fresh small buffer per extent was
        measured to double the cold masks pass via glibc alloc churn
        under the VM's page-fault tax."""
        offsets = list(offsets)
        out = np.empty((len(offsets), nbytes), np.uint8)
        if nbytes == 0 or not offsets:
            return out
        bounce = None
        i = 0
        while i < len(offsets):
            j = i + 1
            while (j < len(offsets)
                   and offsets[j] == offsets[j - 1] + nbytes):
                j += 1
            off, span = offsets[i], (j - i) * nbytes
            if off < 0 or off + span > self.size:
                raise ValueError(
                    f"read [{off}, {off + span}) outside {self.path} "
                    f"(size {self.size})")
            if not self.direct:
                flat = memoryview(out.reshape(-1))
                got = self._pread_full(
                    flat[i * nbytes:i * nbytes + span], off)
                if got < span:
                    raise IOError(f"short read at {off} ({self.path})")
            elif span >= (4 << 20):
                # big contiguous run: dedicated buffer (shim-pooled)
                out[i:j] = self.read_range(off, span).reshape(j - i,
                                                              nbytes)
            else:
                head = off % _ALIGN
                span_al = -(-(head + span) // _ALIGN) * _ALIGN
                if bounce is None or bounce.size < span_al:
                    bounce = _aligned_empty(max(span_al, 4 << 20))
                try:
                    got = self._pread_full(
                        memoryview(bounce)[:span_al], off - head)
                except OSError:
                    self._demote()
                    continue  # retry this group buffered
                if off - head + got < off + span:
                    self._demote()
                    continue
                out[i:j] = bounce[head:head + span].reshape(j - i,
                                                            nbytes)
            i = j
        return out
