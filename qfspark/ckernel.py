"""Optional compiled scalar-insert kernel for the incremental batch path.

``QF.insert_hashes`` — the applyInPandasWithState streaming-dedup hot
path — is dispatch-bound in pure numpy at small batches: the round-7
bit-packed vectorization bottomed out at ~2.4 us/insert for 200-row
batches (~50 numpy dispatches of ~1 us each per chunk, profiled with
cProfile — the arithmetic itself is nanoseconds). A scalar C loop has
no dispatch at all, so this module compiles the EXACT
``_insert_hash_nogrow`` algorithm (a line-by-line port; same slot meta
bits, same duplicate/ripple/findStart control flow) to a shared object
with the system C compiler at first use and drives it through ctypes.

Strictly an accelerator, never a requirement:

* It only applies to UNPACKED vectors (one uint64 word per slot — the
  library default and the streaming-state configuration); bit-packed
  filters keep the numpy path.
* Compilation is attempted once per process; ANY failure (no compiler,
  read-only tempdir, load error) silently selects the numpy path, which
  remains byte-identical (the differential suites run both).
* ``QFSPARK_NO_CKERNEL=1`` disables it outright (used by the parity
  tests to pin the numpy path, and the escape hatch for exotic
  toolchains).

The compiled object is cached under the user cache dir keyed by the md5
of the C source, so each source revision compiles at most once per
machine; the write is build-to-temp + atomic rename, safe under
concurrent executors.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

import numpy as np

_C_SRC = r"""
#include <stdint.h>

#define OCC 1ULL
#define CONT 2ULL
#define SHIFT 4ULL
#define META 7ULL

/* Exact port of qfspark.kernel.QF._insert_hash_nogrow over UNPACKED
   slot/storage word arrays. hashes: ascending, no growth within the
   call (the caller chunks growth-safely). value: pre-clamped to the
   counter mask by the caller (min(v, cmask) commutes with the add
   branch's min(old + v, cmask) saturation). present_out[i] = 1 when
   hashes[i] was already present. Returns the number of NEW entries. */
long qf_insert_batch(uint64_t *filt, uint64_t *storage,
                     long size, int r_bits, uint64_t r_mask,
                     uint64_t cmask, const uint64_t *hashes, long n,
                     uint64_t value, int add, uint8_t *present_out)
{
    long mask = size - 1;
    long new_entries = 0;
    for (long e = 0; e < n; e++) {
        uint64_t hv = hashes[e];
        long dq = (long)(hv >> r_bits);
        uint64_t dr = hv & r_mask;
        uint64_t sd = filt[dq];
        present_out[e] = 0;

        /* case 1: home slot empty -> claim it */
        if ((sd & META) == 0) {
            filt[dq] = OCC | (dr << 3);
            if (storage)
                storage[dq] = value;
            new_entries++;
            continue;
        }

        int extending = (sd & OCC) != 0;
        if (!extending)
            filt[dq] = sd | OCC;

        long run_start = dq;
        if (sd & SHIFT) {
            /* findStart (reference qf.go:422-444) */
            long runs = 1, complete = 0;
            long i = dq;
            for (;;) {
                uint64_t s = filt[i];
                if (!(s & CONT)) complete++;
                if (!(s & SHIFT)) break;
                if (s & OCC) runs++;
                i = (i - 1) & mask;
            }
            long pos = dq;
            while (runs > complete) {
                pos = (pos + 1) & mask;
                if (!(filt[pos] & CONT)) complete++;
            }
            run_start = pos;
        }

        /* find sorted position within the run */
        long slot = run_start;
        uint64_t cur = filt[slot];
        if (extending) {
            for (;;) {
                if ((cur & META) == 0 || (cur >> 3) >= dr)
                    break;
                slot = (slot + 1) & mask;
                cur = filt[slot];
                if (!(cur & CONT))
                    break;
            }
            if ((cur & META) != 0 && (cur >> 3) == dr &&
                (slot == run_start || (cur & CONT))) {
                /* duplicate within our own run: overwrite/add count */
                if (storage) {
                    if (add) {
                        __uint128_t s =
                            (__uint128_t)storage[slot] + value;
                        storage[slot] =
                            s < (__uint128_t)cmask ? (uint64_t)s : cmask;
                    } else {
                        storage[slot] = value;
                    }
                }
                present_out[e] = 1;
                continue;
            }
        }

        /* case 3: ripple-shift the new remainder into place */
        new_entries++;
        int shifted_bit = slot != dq;
        int cont_bit = slot != run_start;
        uint64_t cur_r = dr;
        uint64_t cur_v = value;
        for (;;) {
            uint64_t old = filt[slot];
            filt[slot] = (old & OCC)
                | (cont_bit ? CONT : 0)
                | (shifted_bit ? SHIFT : 0)
                | (cur_r << 3);
            if (storage) {
                uint64_t t = storage[slot];
                storage[slot] = cur_v;
                cur_v = t;
            }
            if ((old & META) == 0)
                break;
            if ((slot == run_start && extending) || (old & CONT))
                cont_bit = 1;
            else
                cont_bit = 0;
            cur_r = old >> 3;
            slot = (slot + 1) & mask;
            shifted_bit = 1;
        }
    }
    return new_entries;
}
"""

_lib = None
_tried = False


def _cache_dir() -> str:
    base = os.environ.get("XDG_CACHE_HOME") or os.path.join(
        os.path.expanduser("~"), ".cache")
    d = os.path.join(base, "qfspark")
    try:
        os.makedirs(d, exist_ok=True)
        return d
    except OSError:
        return tempfile.gettempdir()


def _compile_and_load() -> ctypes.CDLL:
    tag = hashlib.md5(_C_SRC.encode()).hexdigest()[:16]
    so_path = os.path.join(_cache_dir(), f"qf_ckernel_{tag}.so")
    if not os.path.exists(so_path):
        cc = os.environ.get("CC", "cc")
        with tempfile.TemporaryDirectory() as td:
            c_path = os.path.join(td, "qf_ckernel.c")
            tmp_so = os.path.join(td, "qf_ckernel.so")
            with open(c_path, "w") as f:
                f.write(_C_SRC)
            subprocess.run(
                [cc, "-O2", "-shared", "-fPIC", "-o", tmp_so, c_path],
                check=True, capture_output=True, timeout=120,
            )
            # atomic publish: concurrent processes race benignly (same
            # bytes; rename over an existing file is atomic on POSIX)
            os.replace(tmp_so, so_path)
    lib = ctypes.CDLL(so_path)
    fn = lib.qf_insert_batch
    fn.restype = ctypes.c_long
    fn.argtypes = [
        ctypes.POINTER(ctypes.c_uint64),  # filt
        ctypes.POINTER(ctypes.c_uint64),  # storage (or NULL)
        ctypes.c_long,                    # size
        ctypes.c_int,                     # r_bits
        ctypes.c_uint64,                  # r_mask
        ctypes.c_uint64,                  # cmask
        ctypes.POINTER(ctypes.c_uint64),  # hashes
        ctypes.c_long,                    # n
        ctypes.c_uint64,                  # value (pre-clamped)
        ctypes.c_int,                     # add
        ctypes.POINTER(ctypes.c_uint8),   # present_out
    ]
    return lib


def get_kernel():
    """The loaded kernel library, or None when unavailable/disabled.
    Tried once per process; every failure mode degrades to None."""
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("QFSPARK_NO_CKERNEL"):
        _lib = None
        return _lib
    try:
        _lib = _compile_and_load()
    except Exception:
        _lib = None
    return _lib


_U64P = ctypes.POINTER(ctypes.c_uint64)
_U8P = ctypes.POINTER(ctypes.c_uint8)


def insert_batch(lib, filt_words: np.ndarray,
                 storage_words: np.ndarray | None,
                 size: int, r_bits: int, r_mask: int, cmask: int,
                 hashes: np.ndarray, value: int, add: bool) -> tuple:
    """Drive one growth-safe ascending chunk through the C kernel.
    Returns (present_flags: bool ndarray, new_entries: int)."""
    n = len(hashes)
    present = np.zeros(n, dtype=np.uint8)
    new = lib.qf_insert_batch(
        filt_words.ctypes.data_as(_U64P),
        storage_words.ctypes.data_as(_U64P)
        if storage_words is not None else None,
        size, r_bits, r_mask & 0xFFFFFFFFFFFFFFFF,
        cmask & 0xFFFFFFFFFFFFFFFF,
        hashes.ctypes.data_as(_U64P), n,
        (min(int(value), cmask) if storage_words is not None else 0)
        & 0xFFFFFFFFFFFFFFFF,
        1 if add else 0,
        present.ctypes.data_as(_U8P),
    )
    return present.view(bool), int(new)
