"""Shape-grouped fused AdamW: the whole optimizer step in ~#shapes kernels.

The reference optimizes with torch.optim.AdamW (main_eDOS.py:93). The optax
translation (train/trainer.make_adamw) is semantically right but maps to one
multi-output XLA fusion PER PARAMETER LEAF — 121 small kernels for the
flagship model, measured 214 us/step on v5e, dominated by per-kernel launch
and DMA-ramp overhead rather than HBM traffic (the update moves ~125 MB).

The idea: group leaves by (shape, dtype), store the Adam moments as one
STACKED array per group, and compute the update — including the new params,
p' = p - lr*(mhat/(sqrt(vhat)+eps) + wd*p) — in one multi-output fusion per
group, dropping the kernel count 121 -> ~17.

MEASURED OUTCOME (v5e, flagship config) — kept OPT-IN after losing
end-to-end: in an isolated update microbenchmark the grouped layout wins
214 -> 118 us/step, but inside the real train step it LOSES (1094 -> 1235
us/step): XLA does not input-fuse the stack of the backward's per-leaf grad
buffers nor the param stack, and the slice-back into the tree-shaped scan
carry adds another full copy (profile: +69 us copy-done, +54 us
slice_bitcast_fusion, fusion bucket +123 us). The per-leaf optax layout
never pays those passes because each leaf's update fusion writes its carry
buffer directly. Revisit only with params stored stacked end-to-end
(including the model-side views) — which breaks the param-tree surface
(checkpoints, TP shardings, golden tests) for ~3% of step time.

Semantics are the optax/torch AdamW chain exactly (decoupled weight decay on
ALL params, betas (0.9, 0.999), eps 1e-8, first moment stored bf16, second
moment f32 — see make_adamw for the dtype rationale); equality against
optax.adamw is pinned by tests/test_train.py.

Not an optax.GradientTransformation: optax's contract returns additive
updates applied in a separate pass, which would force an extra full read and
write of the parameters; update_params fuses the application instead. The
Trainer dispatches on this type.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class _GroupMeta(NamedTuple):
    treedef: Any
    keys: tuple              # group key per group: (shape, dtype_name)
    members: tuple           # tuple of leaf indices per group (flatten order)


class FusedAdamW:
    """Grouped fused AdamW with torch semantics (see module docstring).

    Usage (the Trainer does this internally):
        opt = FusedAdamW(lr=1e-4, weight_decay=1e-2)
        state = opt.init(params)
        params, state = opt.update_params(grads, state, params)
    """

    def __init__(self, lr: float = 1e-4, b1: float = 0.9, b2: float = 0.999,
                 eps: float = 1e-8, weight_decay: float = 1e-2,
                 mu_dtype=jnp.bfloat16):
        self.lr, self.b1, self.b2, self.eps = lr, b1, b2, eps
        self.weight_decay = weight_decay
        self.mu_dtype = mu_dtype        # None = store mu at param dtype
        self._meta: _GroupMeta | None = None

    # -- grouping -------------------------------------------------------------
    def _build_meta(self, params) -> _GroupMeta:
        leaves, treedef = jax.tree.flatten(params)
        by_key: dict = {}
        for i, leaf in enumerate(leaves):
            by_key.setdefault((leaf.shape, leaf.dtype.name), []).append(i)
        keys = tuple(by_key)
        return _GroupMeta(treedef, keys,
                          tuple(tuple(by_key[k]) for k in keys))

    def _group(self, tree):
        leaves = jax.tree.leaves(tree)
        return {k: jnp.stack([leaves[i] for i in members])
                for k, members in zip(self._meta.keys, self._meta.members)}

    def _ensure_meta(self, params) -> _GroupMeta:
        """The grouping metadata is fully derivable from the param tree, so a
        FRESH optimizer instance can consume a checkpointed opt_state without
        init() having run (ADVICE r2: the restore path would otherwise
        assert). Rebuilt lazily and cached."""
        if self._meta is None:
            self._meta = self._build_meta(params)
        return self._meta

    def init(self, params):
        """Grouped zero moments + step count. Caches the (static) grouping
        metadata on the optimizer instance."""
        self._meta = self._build_meta(params)
        grouped = self._group(params)
        mu_dt = self.mu_dtype
        mu = {k: jnp.zeros(v.shape, mu_dt or v.dtype)
              for k, v in grouped.items()}
        nu = {k: jnp.zeros(v.shape, jnp.float32) for k, v in grouped.items()}
        return {"mu": mu, "nu": nu, "count": jnp.zeros((), jnp.int32)}

    # -- the fused update -----------------------------------------------------
    def update_params(self, grads, opt_state, params):
        """One multi-output fusion per shape group: new (params, opt_state)."""
        meta = self._ensure_meta(params)
        g_leaves = jax.tree.leaves(grads)
        p_leaves = list(jax.tree.leaves(params))
        count = opt_state["count"] + 1
        # decay**count with the INTEGER count, exactly like
        # optax.tree.bias_correction (jnp.power with an int exponent is exact
        # repeated squaring; a float-cast exponent goes through exp/log and
        # lands 1 ulp off, breaking bitwise parity with optax)
        bc1 = 1.0 - self.b1 ** count
        bc2 = 1.0 - self.b2 ** count

        mu_out, nu_out = {}, {}
        for k, members in zip(meta.keys, meta.members):
            g = jnp.stack([g_leaves[i].astype(jnp.float32) for i in members])
            p = jnp.stack([p_leaves[i] for i in members])
            # operand order AND dtype promotion match optax.update_moment
            # exactly: b1*mu multiplies a weak python scalar into the bf16
            # moment (the product rounds to bf16 BEFORE the f32 add) — an
            # explicit f32 upcast of mu lands 1 bf16 ulp away and breaks
            # bitwise parity with optax
            m = (1.0 - self.b1) * g + self.b1 * opt_state["mu"][k]
            v = (1.0 - self.b2) * (g * g) + self.b2 * opt_state["nu"][k]
            # optax order of ops: mhat from the UNCAST f32 moment; the cast
            # applies to the stored state only (scale_by_adam semantics)
            upd = (m / bc1) / (jnp.sqrt(v / bc2) + self.eps) \
                + self.weight_decay * p
            p = p - self.lr * upd
            mu_out[k] = m.astype(opt_state["mu"][k].dtype)
            nu_out[k] = v
            for j, i in enumerate(members):
                p_leaves[i] = p[j].astype(p_leaves[i].dtype)

        new_params = jax.tree.unflatten(meta.treedef, p_leaves)
        return new_params, {"mu": mu_out, "nu": nu_out, "count": count}
