"""TrainState + SPMD step builders.

The compiled training step is the framework's unit of execution
(SURVEY.md §7.1: "training step = one pjit'd function"): normalize → backbone
→ RPN (labeling, sampling, proposal NMS) → heads → losses → grads → optax
update, compiled once over the mesh. Gradient reduction across the "data" axis
is inserted by XLA from the shardings — no explicit collectives.
"""

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["TrainState", "make_train_step", "make_eval_step"]


class TrainState(struct.PyTreeNode):
    """Parameters + optimizer state + step counter (a minimal, orbax-friendly
    train state)."""

    step: jnp.ndarray
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(cls, params, tx: optax.GradientTransformation) -> "TrainState":
        return cls(step=jnp.zeros((), jnp.int32), params=params, opt_state=tx.init(params), tx=tx)

    def apply_gradients(self, grads) -> "TrainState":
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=new_params, opt_state=new_opt_state)


def make_train_step(
    model,
    mesh: Optional[Mesh] = None,
    donate: bool = True,
    state_shardings: Optional[Any] = None,
) -> Callable:
    """Build the jitted SPMD train step.

    Returns step(state, batch, rng) -> (state, loss_dict). When a mesh is
    given, params/opt state are replicated and the batch is sharded over
    "data"; XLA inserts the gradient all-reduce. Pass ``state_shardings``
    (a TrainState-shaped pytree of NamedShardings from
    :func:`detectron2_tpu.parallel.tree_shardings`) to instead shard the
    parameters and optimizer state across the mesh — FSDP/ZeRO over the
    "data" axis or tensor parallelism over the "model" axis; XLA inserts the
    all-gathers / reduce-scatters the layout implies.
    """

    def step_fn(state: TrainState, batch: Dict[str, jnp.ndarray], rng) -> Tuple[TrainState, Dict]:
        variables = state.params
        # non-"params" collections (meters, batch_stats) update in the fwd pass
        mutable = [c for c in variables.keys() if c != "params"] if isinstance(variables, dict) else []

        def loss_fn(params):
            if mutable:
                losses, new_vars = model.apply(
                    params, batch, train=True, rngs={"sampling": rng, "dropout": rng}, mutable=mutable
                )
            else:
                losses = model.apply(params, batch, train=True, rngs={"sampling": rng, "dropout": rng})
                new_vars = {}
            total = sum(jax.tree_util.tree_leaves(losses))
            return total, (losses, new_vars)

        (total, (losses, new_vars)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads)
        if mutable and new_vars:
            merged = dict(new_state.params)
            merged.update(jax.lax.stop_gradient(new_vars))
            new_state = new_state.replace(params=merged)
        losses = dict(losses)
        losses["total_loss"] = total
        return new_state, losses

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,) if donate else ())

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    state_sh = repl if state_shardings is None else state_shardings
    return jax.jit(
        step_fn,
        in_shardings=(state_sh, data, repl),
        out_shardings=(state_sh, repl),
        donate_argnums=(0,) if donate else (),
    )


def make_eval_step(
    model, mesh: Optional[Mesh] = None, param_shardings: Optional[Any] = None
) -> Callable:
    """Build the jitted inference step: (params, batch) -> padded detections.

    ``param_shardings`` (params-shaped pytree of NamedShardings) runs
    inference with sharded parameters (FSDP / tensor-parallel layouts)."""

    def eval_fn(params, batch):
        return model.apply(params, batch, train=False)

    if mesh is None:
        return jax.jit(eval_fn)
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    params_sh = repl if param_shardings is None else param_shardings
    return jax.jit(eval_fn, in_shardings=(params_sh, data), out_shardings=data)
