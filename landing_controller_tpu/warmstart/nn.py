"""Learned warm-start pipeline: normalization, MLP, training, inference.

TPU-native re-build of the reference's L5 layer (SURVEY.md §2.2):

- **Normalization** (data_normalization.m:40-115): per-dimension z-score of
  the 9-D input and of X / foot-position / jpos outputs; GRFs are
  time-aligned per leg to their touchdown index (first knot with f_z > 1 N),
  padded with the final value, and scaled by bodyweight m*g; the 4 touchdown
  indices are appended to the target.  Output dim = 12*21 + 24*20 + 12*20
  + 4 = 976, matching the reference ONNX head.
- **MLP** (nn_landing.m:100-144): 9 -> 256 -> 256 -> 256 -> 976, ReLU
  (hidden width recovered from the ONNX initializer sizes).  Implemented as
  a plain pytree of dense layers (jit/vmap/pjit friendly, no framework
  state), trained with optax Adam.
- **Denormalization** (data_denormalization.m:1-40): inverse transforms,
  GRFs shifted back by the (rounded) predicted touchdown indices.

The input is the 9-D initial condition [rpy(3), omega(3), v(3)]
(generate_training_data_automated.m:208-213); the output warm-starts the
kinodynamic solve as z0 = [X(:); jpos(:); U(:)].
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

N_KNOTS = 21
INPUT_DIM = 9
OUTPUT_DIM = 12 * N_KNOTS + 24 * (N_KNOTS - 1) + 12 * (N_KNOTS - 1) + 4  # 976
HIDDEN = 256


class DataStats(NamedTuple):
    """Normalization statistics (the reference's data_stats.mat)."""

    mean_input: jnp.ndarray  # (9,)
    std_input: jnp.ndarray
    mean_X: jnp.ndarray  # (N,12)
    std_X: jnp.ndarray
    mean_c: jnp.ndarray  # (N-1,12) foot positions
    std_c: jnp.ndarray
    mean_jpos: jnp.ndarray  # (N-1,12)
    std_jpos: jnp.ndarray
    mass: jnp.ndarray  # scalar (for the m*g GRF scale)


def _touchdown_align_forward(f_leg, td_idx):
    """Shift one leg's (N-1,3) GRF history so touchdown is at index 0,
    padding the tail with the final value (data_normalization.m:84-90)."""
    n = f_leg.shape[0]
    idx = jnp.clip(jnp.arange(n) + td_idx, 0, n - 1)
    return f_leg[idx]


def _touchdown_align_inverse(f_leg, td_idx):
    """Inverse shift: prepend td_idx zeros (data_denormalization.m:32-38)."""
    n = f_leg.shape[0]
    idx = jnp.arange(n) - td_idx
    shifted = jnp.where(idx[:, None] >= 0, f_leg[jnp.clip(idx, 0, n - 1)], 0.0)
    return shifted


def touchdown_indices(U):
    """Per-leg first knot with f_z > 1 N (data_normalization.m:86), (4,).

    A leg that never exceeds 1 N (flight-only) gets index N-1 = one past the
    last GRF knot — the distinct "never landed" label (the reference's
    `find(...,1)` returns empty there and the sample is handled separately;
    argmax of an all-False row would silently claim touchdown at knot 0 and
    misalign the leg's GRF history)."""
    fz = U[:, 14::3]  # (N-1, 4)
    hit = fz > 1.0
    never = ~jnp.any(hit, axis=0)
    return jnp.where(never, fz.shape[0], jnp.argmax(hit, axis=0))


def compute_stats(inputs, X, U, jpos, mass) -> DataStats:
    """Fit normalization statistics on a dataset (leading sample axis)."""
    return DataStats(
        mean_input=inputs.mean(0),
        std_input=inputs.std(0) + 1e-8,
        mean_X=X.mean(0),
        std_X=X.std(0) + 1e-8,
        mean_c=U[:, :, :12].mean(0),
        std_c=U[:, :, :12].std(0) + 1e-8,
        mean_jpos=jpos.mean(0),
        std_jpos=jpos.std(0) + 1e-8,
        mass=jnp.asarray(mass),
    )


def normalize_sample(stats: DataStats, x_in, X, U, jpos):
    """One (input, trajectory) pair -> normalized (input, 976-target)."""
    xin_n = (x_in - stats.mean_input) / stats.std_input
    td = touchdown_indices(U)
    f = U[:, 12:].reshape(-1, 4, 3)
    f_aligned = jax.vmap(_touchdown_align_forward, in_axes=(1, 0), out_axes=1)(f, td)
    f_norm = f_aligned / (stats.mass * 9.81)
    X_n = (X - stats.mean_X) / stats.std_X
    X_n = X_n.at[0, 0:2].set(0.0)  # zero the (arbitrary) initial xy
    c_n = (U[:, :12] - stats.mean_c) / stats.std_c
    jpos_n = (jpos - stats.mean_jpos) / stats.std_jpos
    U_n = jnp.concatenate([c_n, f_norm.reshape(-1, 12)], axis=1)
    target = jnp.concatenate(
        [X_n.reshape(-1), U_n.reshape(-1), jpos_n.reshape(-1), td.astype(X.dtype)]
    )
    return xin_n, target


def denormalize_output(stats: DataStats, y):
    """976-D network output -> (X (N,12), U (N-1,24), jpos (N-1,12))."""
    n = N_KNOTS
    nx = 12 * n
    nu = 24 * (n - 1)
    nj = 12 * (n - 1)
    X_n = y[:nx].reshape(n, 12)
    U_n = y[nx : nx + nu].reshape(n - 1, 24)
    jpos_n = y[nx + nu : nx + nu + nj].reshape(n - 1, 12)
    # n-1 = the "never landed" label: the inverse shift then yields an
    # all-zero GRF history for that leg
    td = jnp.clip(jnp.round(y[nx + nu + nj :]), 0, n - 1).astype(jnp.int32)

    X = X_n * stats.std_X + stats.mean_X
    c = U_n[:, :12] * stats.std_c + stats.mean_c
    f_aligned = (U_n[:, 12:] * (stats.mass * 9.81)).reshape(-1, 4, 3)
    f = jax.vmap(_touchdown_align_inverse, in_axes=(1, 0), out_axes=1)(f_aligned, td)
    U = jnp.concatenate([c, f.reshape(-1, 12)], axis=1)
    jpos = jpos_n * stats.std_jpos + stats.mean_jpos
    return X, U, jpos


# ----------------------------------------------------------------- MLP
@dataclasses.dataclass(frozen=True)
class MLPParams:
    """Dense-layer pytree: 9 -> 256 -> 256 -> 256 -> 976, ReLU."""

    weights: tuple
    biases: tuple


jax.tree_util.register_pytree_node(
    MLPParams,
    lambda p: ((p.weights, p.biases), None),
    lambda aux, ch: MLPParams(weights=ch[0], biases=ch[1]),
)


def init_mlp(key, hidden: int = HIDDEN, depth: int = 3, dtype=jnp.float32) -> MLPParams:
    sizes = [INPUT_DIM] + [hidden] * depth + [OUTPUT_DIM]
    ws, bs = [], []
    for i, (m, n) in enumerate(zip(sizes[:-1], sizes[1:])):
        key, sub = jax.random.split(key)
        scale = jnp.sqrt(2.0 / m).astype(dtype)
        ws.append(jax.random.normal(sub, (m, n), dtype) * scale)
        bs.append(jnp.zeros(n, dtype))
    return MLPParams(weights=tuple(ws), biases=tuple(bs))


def mlp_apply(params: MLPParams, x):
    """Forward pass (matches the ONNX graph: Gemm+ReLU x3, Gemm head)."""
    h = x
    for w, b in zip(params.weights[:-1], params.biases[:-1]):
        h = jax.nn.relu(h @ w + b)
    return h @ params.weights[-1] + params.biases[-1]


def train_mlp(
    inputs_n,
    targets_n,
    key=None,
    epochs: int = 400,
    batch_size: int = 256,
    lr: float = 1e-3,
    hidden: int = HIDDEN,
):
    """Train the warm-start MLP with Adam on MSE (the reference trains the
    equivalent network externally in PyTorch; nn_landing.m:95 graph name
    'torch_jit_export').  Returns (params, loss_history)."""
    import optax

    if key is None:
        key = jax.random.PRNGKey(0)
    key, init_key = jax.random.split(key)
    params = init_mlp(init_key, hidden=hidden)
    opt = optax.adam(lr)
    opt_state = opt.init(params)
    n = inputs_n.shape[0]
    bs = min(batch_size, n)

    @jax.jit
    def step(params, opt_state, xb, yb):
        def loss_fn(p):
            pred = mlp_apply(p, xb)
            return jnp.mean((pred - yb) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    losses = []
    for epoch in range(epochs):
        key, sub = jax.random.split(key)
        perm = jax.random.permutation(sub, n)
        epoch_loss = 0.0
        for i in range(0, n - bs + 1, bs):
            xb = inputs_n[perm[i : i + bs]]
            yb = targets_n[perm[i : i + bs]]
            params, opt_state, loss = step(params, opt_state, xb, yb)
            epoch_loss += float(loss)
        losses.append(epoch_loss / max(1, n // bs))
    return params, losses


def nn_warmstart_guess(params: MLPParams, stats: DataStats, q_init, qd_init, problem):
    """9-D initial condition -> warm-start vector z0 for `problem`.

    Mirrors nn_warmstart.m:130-139: normalize input, MLP, denormalize,
    pack [X(:); jpos(:); U(:)].  For non-kinodynamic problems (srbm_lcp)
    the predicted jpos block is dropped — the base trajectory and
    foot/GRF pattern transfer directly (same N=21 production time grid).
    """
    from ..problems.landing import LandingVars

    x_in = jnp.concatenate([q_init[3:6], qd_init])
    xin_n = (x_in - stats.mean_input) / stats.std_input
    y = mlp_apply(params, xin_n)
    X, U, jpos = denormalize_output(stats, y)
    # re-anchor the trajectory to the queried IC: the network was trained
    # with the arbitrary initial xy zeroed (normalize_sample), so shift the
    # whole plan (base xy and foot xy) to start at q_init's xy, and pin
    # the initial state exactly
    shift = q_init[0:2] - X[0, 0:2]
    X = X.at[:, 0:2].add(shift[None, :])
    U = U.at[:, 0:12:3].add(shift[0])
    U = U.at[:, 1:12:3].add(shift[1])
    X = X.at[0].set(jnp.concatenate([q_init, qd_init]))
    if not problem.config.kinodynamic:
        jpos = jnp.zeros((X.shape[0] - 1, 0), X.dtype)
    return problem.pack(LandingVars(X=X, jpos=jpos, U=U))


# ------------------------------------------------------- persistence
def save_warmstart(path: str, params: MLPParams, stats: DataStats) -> None:
    """Persist trained weights + normalization stats as one .npz — the
    analogue of the reference's committed nn_TO_landing.onnx +
    data_stats.mat pair."""
    arrs = {}
    for i, (w, b) in enumerate(zip(params.weights, params.biases)):
        arrs[f"w{i}"] = np.asarray(w)
        arrs[f"b{i}"] = np.asarray(b)
    arrs["n_layers"] = np.asarray(len(params.weights))
    for name in DataStats._fields:
        arrs[f"stats_{name}"] = np.asarray(getattr(stats, name))
    np.savez_compressed(path, **arrs)


def load_warmstart(path: str, dtype=jnp.float32):
    """Load (MLPParams, DataStats) saved by save_warmstart."""
    d = np.load(path)
    n_layers = int(d["n_layers"])
    ws = tuple(jnp.asarray(d[f"w{i}"], dtype) for i in range(n_layers))
    bs = tuple(jnp.asarray(d[f"b{i}"], dtype) for i in range(n_layers))
    stats = DataStats(
        **{name: jnp.asarray(d[f"stats_{name}"], dtype) for name in DataStats._fields}
    )
    return MLPParams(weights=ws, biases=bs), stats
