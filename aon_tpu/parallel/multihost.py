"""Multi-process (multi-host) eval-frame assembly.

The reference assembles eval outputs across DDP ranks with Lightning's
``self.all_gather`` inside ``alter_gather_cat``
(``/root/reference/models/interface.py:31-51``): concat per-key over
validation steps, all-gather over ranks, reshape to (h, w, C) images.

TPU-native analogue: each process renders a CONTIGUOUS block of the frame's
rays (``process_ray_slice``), and ``alter_gather_cat`` concatenates chunk
outputs locally then ``process_allgather``s the blocks over DCN (tiled
concat along the ray axis) and reshapes to images.  Contiguous blocks (vs
the reference's strided DistributedSampler interleave) keep the gather a
pure concat with no re-indexing.

Validated without hardware by ``scripts/multihost_eval_demo.py`` under
``jax.distributed`` with 2 local CPU processes
(tests/test_multihost.py::test_two_process_gather_matches_single).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import numpy as np


def process_ray_slice(
    n_rays: int,
    process_id: Optional[int] = None,
    process_count: Optional[int] = None,
) -> Tuple[int, int]:
    """[start, stop) of this process's equal-size ray block.

    Blocks are ceil(n/p) long; the last process's block may run past
    ``n_rays`` — render it against an edge-padded ray buffer (see
    ``pad_to_multiple``) and ``alter_gather_cat`` trims the tail.
    """
    pc = process_count if process_count is not None else jax.process_count()
    pid = process_id if process_id is not None else jax.process_index()
    per = -(-n_rays // pc)
    return pid * per, (pid + 1) * per


def alter_gather_cat(
    chunk_outputs: List[Dict[str, np.ndarray]],
    img_wh: Tuple[int, int],
) -> Dict[str, np.ndarray]:
    """Concat per-key over chunks, all-gather over processes, reshape to
    (h, w, C) images (reference interface.py:31-51 contract).

    Every process returns the SAME assembled frame (like Lightning's
    all_gather), so rank-0 gating stays a pure logging concern.
    """
    w, h = int(img_wh[0]), int(img_wh[1])
    cat = {
        k: np.concatenate([np.asarray(c[k]) for c in chunk_outputs], axis=0)
        for k in chunk_outputs[0]
    }
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        cat = {
            k: np.asarray(multihost_utils.process_allgather(v, tiled=True))
            for k, v in cat.items()
        }
    out = {}
    for k, v in cat.items():
        v = v[: h * w]
        out[k] = v.reshape(h, w, *v.shape[1:]) if v.ndim > 1 else v.reshape(h, w)
    return out
