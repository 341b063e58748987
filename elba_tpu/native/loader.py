"""Build-on-first-use ctypes loader for the native library.

Compiles fastaio.cpp with g++ -O3 -fopenmp into the package directory the
first time it is needed; callers must tolerate None (numpy fallback) so a
missing toolchain never breaks the framework.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "_elba_native.so")
_SRCS = [os.path.join(_HERE, "fastaio.cpp"),
         os.path.join(_HERE, "kmercount.cpp"),
         os.path.join(_HERE, "trmark.cpp"),
         os.path.join(_HERE, "kmerindex.cpp")]
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-march=native", "-fPIC", "-shared", "-fopenmp",
           *_SRCS, "-o", _SO]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        return True
    except Exception:
        return False


def get_lib():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        src_mtime = max(os.path.getmtime(s) for s in _SRCS)
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < src_mtime:
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        i64 = ctypes.c_int64
        p8 = ctypes.POINTER(ctypes.c_uint8)
        pc = ctypes.c_char_p
        pi64 = ctypes.POINTER(i64)
        lib.fasta_unwrap_pack.argtypes = [pc, i64, i64, pi64, pi64, pi64,
                                          pi64, p8]
        lib.fasta_unwrap_pack.restype = None
        lib.pack_2bit.argtypes = [p8, i64, p8]
        lib.pack_2bit.restype = None
        lib.revcomp_codes.argtypes = [p8, i64, p8]
        lib.revcomp_codes.restype = None
        p32 = ctypes.POINTER(ctypes.c_int32)
        lib.format_paf.argtypes = [pi64, pi64, i64, p32, p32, p32, p8, p32,
                                   p32, p32, p32, p8, pc, pi64,
                                   ctypes.c_char_p, i64]
        lib.format_paf.restype = i64
        pu64 = ctypes.POINTER(ctypes.c_uint64)
        lib.kmer_count_reliable.argtypes = [p8, pi64, i64, i64, i64, i64,
                                            pi64, pi64, p32, pu64, pi64]
        lib.kmer_count_reliable.restype = i64
        p8i = ctypes.POINTER(ctypes.c_int8)
        lib.tr_mark.argtypes = [pi64, pi64, p8i, p32, i64, i64,
                                ctypes.c_int32, p8]
        lib.tr_mark.restype = None
        lib.genome_kmer_index.argtypes = [p8, i64, i64, pu64, pi64]
        lib.genome_kmer_index.restype = None
        _lib = lib
        return _lib


def native_available() -> bool:
    return get_lib() is not None
