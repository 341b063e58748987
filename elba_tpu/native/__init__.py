"""Native (C++) runtime components, loaded via ctypes with transparent
numpy fallback.  The compute path is JAX/Pallas; these cover the host-side
hot paths the reference implements in C++ (FASTA ingest, packing)."""

from .loader import get_lib, native_available
