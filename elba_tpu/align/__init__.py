"""Batched X-drop seed-and-extend alignment.

Two implementations of the identical integer-exact algorithm (reference
src/XDropAligner.cpp:46-282):

  * xdrop_ref: scalar numpy oracle, the executable specification used by
    the tests and as a fallback for band-overflow pairs.
  * xdrop_jax: batched banded antidiagonal wavefront in JAX with static
    band width and masked termination -- the TPU compute path, vmapped
    over pairs.

Both reproduce the reference's scores and extension coordinates exactly,
including its quirks (the "last column beating the previous global best"
best-extension update rule; see xdrop_ref.extend_one_direction).
"""

from .xdrop_ref import xdrop_align_ref, extend_one_direction_ref
from .classify import classify_and_fill
from .pairwise import pairwise_alignment
