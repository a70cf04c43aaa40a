"""Serving tier: paged-cache management + continuous batching over the
decode kernels (the BASELINE north star's "continuous batching across
hosts" component — the reference library leaves this to the serving stack;
here it ships in-tree so the paged kernels are exercised the way a server
drives them)."""

from .engine import (ContinuousBatcher, PagedCache, PageAllocator,  # noqa
                     SequenceState)
