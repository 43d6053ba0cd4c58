"""Latent code library for the auto-decoder articulated NeRF.

Contract from reference ``models/code_library.py:12-71``: per-instance shape
and appearance embeddings (``N_max_objs`` x ``N_obj_code_length``) and a
10 x 32 articulation table, xavier-uniform initialized.  Test-time
articulation interpolation produces ``2*10 - 1 = 19`` codes by inserting
midpoint averages between consecutive learned codes
(code_library.py:55-71).

In JAX the tables are ordinary param leaves, so the reference's
"optimizer over embeddings" (model_autodecoder.py:604-606) falls out of the
single optax update for free.
"""

from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax.numpy as jnp

N_MAX_ARTICULATIONS = 10
N_ART_CODE_LENGTH = 32


def interpolate_articulations(table: jnp.ndarray) -> jnp.ndarray:
    """(N, C) learned codes -> (2N - 1, C): even rows are the learned codes,
    odd rows are midpoints of their neighbors (reference code_library.py:55-71)."""
    n = table.shape[0]
    mids = 0.5 * (table[:-1] + table[1:])
    out = jnp.zeros((2 * n - 1, table.shape[1]), table.dtype)
    out = out.at[0::2].set(table)
    out = out.at[1::2].set(mids)
    return out


class CodeLibraryArticulated(nn.Module):
    n_max_objs: int = 151
    n_obj_code_length: int = 128
    n_max_articulations: int = N_MAX_ARTICULATIONS
    n_art_code_length: int = N_ART_CODE_LENGTH

    @nn.compact
    def __call__(
        self,
        instance_id: jnp.ndarray,
        articulation_id: jnp.ndarray,
        is_test: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        """instance_id / articulation_id: int scalars or (B,) arrays.

        Returns {density, color, articulation} embedding rows.  When
        ``is_test`` is True, articulation_id indexes the 2N-1 interpolated
        table instead of the learned one.
        """
        emb_kw = dict(embedding_init=nn.initializers.xavier_uniform())
        shape_tbl = nn.Embed(
            self.n_max_objs, self.n_obj_code_length, name="embedding_instance_shape", **emb_kw
        )
        appearance_tbl = nn.Embed(
            self.n_max_objs,
            self.n_obj_code_length,
            name="embedding_instance_appearance",
            **emb_kw,
        )
        articulation_tbl = nn.Embed(
            self.n_max_articulations,
            self.n_art_code_length,
            name="embedding_instance_articulation",
            **emb_kw,
        )

        instance_id = jnp.atleast_1d(jnp.asarray(instance_id))
        articulation_id = jnp.atleast_1d(jnp.asarray(articulation_id))

        ret = {
            "density": shape_tbl(instance_id),
            "color": appearance_tbl(instance_id),
        }
        if is_test:
            interp = interpolate_articulations(articulation_tbl.embedding)
            ret["articulation"] = interp[articulation_id]
        else:
            ret["articulation"] = articulation_tbl(articulation_id)
        return ret
