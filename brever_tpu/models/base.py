"""Model family base class and registry.

The reference's ``BreverBaseModel`` is a torch ``nn.Module`` that owns
its optimizer and implements train/val steps imperatively (reference
brever/models/base.py:12-358). The TPU-native equivalent is a *family
object*: a plain Python class that bundles

* a flax module (``self.module``) and its init,
* pure, jittable functions — ``loss(variables, batch, lengths, rng)``
  and ``_enhance(variables, x)`` — that the trainer traces into the
  sharded train step,
* an optax optimizer chain (``optimizer()``), replacing per-model
  ``torch.optim`` ownership,
* host-side hooks: ``transform`` (device-side feature extraction, also
  usable on host), ``pre_train`` (e.g. dataset statistics),
  ``on_validate`` (LR schedules).

Per-item loss contract: ``loss`` returns a ``(batch,)`` vector (or a
dict of vectors for GANs). The trainer masks rows added to round the
batch up to the mesh size (their ``lengths`` are 0) before averaging —
this is what makes data-parallel padding exact rather than approximate.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..criterion import init_criterion
from ..registry import Registry

ModelRegistry = Registry('model')


def count_params(variables, collection='params'):
    """Number of trainable parameters in a variables pytree."""
    tree = variables.get(collection, variables) \
        if isinstance(variables, dict) else variables
    return sum(np.prod(leaf.shape).item() if hasattr(leaf, 'shape') else 1
               for leaf in jax.tree.leaves(tree))


def sample_weighted_mean(per_item, lengths):
    """Mean over real samples only (rows with length 0 are mesh padding)."""
    if per_item.ndim == 0:
        return per_item
    weights = (lengths > 0).astype(per_item.dtype)
    if weights.ndim > 1:
        weights = weights[:, 0]
    return (per_item * weights).sum() / jnp.maximum(weights.sum(), 1)


def param_dtype(variables):
    """Floating dtype of the (possibly amp-cast) parameters.

    The trainer's bf16 path casts params and the batch to bfloat16
    inside the jitted loss, but STFT front-ends silently promote
    activations back to float32 (FFTs are complex64, and
    ``spec.real``/``spec.imag`` are f32).  Spectral models therefore
    cast their network inputs to this dtype at the STFT->network
    boundary so the trunk actually runs in the amp dtype — the
    difference between ~f32 HBM traffic and half of it on
    bandwidth-bound models.  With float32 params this is the identity.
    """
    tree = variables.get('params', variables) \
        if isinstance(variables, dict) else variables
    for leaf in jax.tree.leaves(tree):
        dt = getattr(leaf, 'dtype', None)
        if dt is not None and jnp.issubdtype(dt, jnp.floating):
            return dt
    return jnp.float32


class BreverBaseModel:
    """Base for all model families.

    Subclasses must set ``self.module`` (a flax module) and implement
    ``loss`` and ``_enhance``; they may override ``transform``,
    ``init_variables``, ``optimizer``, ``pre_train`` and
    ``on_validate``.
    """

    _is_submodel = False

    #: gradient clipping max-norm (0 disables), chained into optax
    grad_clip = 0.0
    #: compute dtype for the forward pass; params stay fp32
    compute_dtype = jnp.float32
    #: sources the model consumes from the dataset
    default_sources = ['mixture', 'foreground']

    def __init__(self, criterion=None, **criterion_kwargs):
        if criterion is not None and isinstance(criterion, str):
            criterion = init_criterion(criterion, **criterion_kwargs)
        self.criterion = criterion
        self.module = None

    # ------------------------------------------------------------------
    # construction

    def example_input(self, batch_size=1, length=16000):
        """Example batch used to initialize module parameters."""
        return jnp.zeros((batch_size, 2, 2, length), jnp.float32)

    def init_variables(self, rng):
        """Initialize the flax variables pytree (params + aux
        collections)."""
        raise NotImplementedError

    @staticmethod
    def _jit_init(init_fn, rng, *args):
        """Run a flax ``init`` closure as ONE jitted graph.

        Eager flax init dispatches every primitive as its own XLA
        executable: hundreds of tiny compiles that fall under the
        persistent-cache threshold on CPU and are each a ~1 s remote
        round trip on the tunneled TPU backend. Tracing the whole init
        into a single jit makes it one compile, cached persistently.
        """
        return jax.jit(init_fn)(rng, *args)

    def optimizer(self):
        """optax chain; single transformation or tuple for multi-opt
        models (GANs)."""
        tx = optax.adam(self.learning_rate)
        if self.grad_clip:
            tx = optax.chain(optax.clip_by_global_norm(self.grad_clip), tx)
        return tx

    def prepare_optimizer(self, steps_per_epoch, epochs):
        """Called by the trainer before building the optax chain; lets
        models with per-step schedules (OneCycle) size them."""
        pass

    def init_opt_state(self, tx, params):
        """Initialize optimizer state; multi-optimizer models (GANs)
        override this together with ``make_step_fns``."""
        return tx.init(params)

    def make_step_fns(self, tx):
        """Optional override returning custom
        ``(train_step, val_step)`` pure functions with signature
        ``(state, batch, lengths, _) -> (state, loss)``; return None to
        use the trainer's default single-optimizer steps."""
        return None

    # ------------------------------------------------------------------
    # pure functions traced into the train step

    def transform(self, sources):
        """Pre-processing from raw sources to model inputs.

        Pure jnp; shape ``(n_sources, channels, samples)`` or batched
        with a leading batch axis. Runs inside the jitted step on TPU
        (fused with the model) or on host for tests/datasets.
        """
        return sources

    #: optional per-item *host-side* pre-processing for the dataloader
    #: (numpy in, array-or-tuple out). Unlike :meth:`transform` — which
    #: is traced into the jitted step so XLA fuses it with the model —
    #: this hook is for work that must stay on host (e.g. MetricGAN's
    #: per-item metric precompute, reference metricganokd.py:175-183).
    loader_transform = None

    def loss(self, variables, batch, lengths, rng, train=True):
        """Per-item loss vector ``(batch,)`` (or dict of vectors)."""
        raise NotImplementedError

    def _enhance(self, variables, x):
        """Batched enhancement: ``(B, 2, n) -> (B, n)`` or
        ``(B, S, n)``."""
        raise NotImplementedError

    # ------------------------------------------------------------------
    # convenience wrappers

    def enhance(self, variables, x, rng=None):
        """Unbatched/batched enhancement wrapper (reference
        brever/models/base.py:122-176).

        ``_enhance`` runs under a cached ``jax.jit``: eager flax apply
        dispatches every primitive as its own executable (a remote
        round trip each on the tunneled TPU backend). One trace per
        input shape; validation/eval batches are padded to a few
        static shapes so the cache stays small.
        """
        x = jnp.asarray(x)
        unbatched = x.ndim == 2
        if unbatched:
            x = x[None]
        elif x.ndim != 3:
            raise ValueError(
                f'input must be 2 or 3 dimensional, got {x.ndim}')
        fn = self.__dict__.get('_enhance_jit')
        if fn is None:
            fn = self.__dict__['_enhance_jit'] = jax.jit(self._enhance)
        out = fn(variables, x) if rng is None else fn(variables, x, rng)
        return out[0] if unbatched else out

    # ------------------------------------------------------------------
    # hooks

    def pre_train(self, variables, dataset, dataloader, epochs):
        """One-off pre-training work (e.g. input statistics). Returns
        possibly-updated variables."""
        return variables

    def on_validate(self, val_loss):
        """Called after each validation loop; may return a dict of
        optax hyperparameter updates, e.g. ``{'learning_rate': 5e-4}``
        (applied in place through ``optax.inject_hyperparams`` state,
        so optimizer moments are preserved)."""
        return None

    def extra_state(self):
        """Host-side model state to persist in checkpoints (e.g. LR
        scheduler state). Must be msgpack-serializable."""
        return {}

    def load_extra_state(self, state):
        pass

    def compile(self, *args, **kwargs):
        """API-parity no-op: the reference optionally torch.compiles the
        model in place (brever/models/base.py:334-352); here every
        compute path is jit-compiled by construction."""
        pass

    # ------------------------------------------------------------------
    # helpers

    @staticmethod
    def frame_count(lengths, frame_length, hop_length):
        """Traced frame count matching ``STFT.frame_count``."""
        lengths = jnp.asarray(lengths)
        return (jnp.ceil(
            jnp.maximum(lengths - frame_length, 0) / hop_length
        ) + 1).astype(jnp.int32)

    @staticmethod
    def static_frame_count(samples, frame_length, hop_length):
        return math.ceil(max(samples - frame_length, 0) / hop_length) + 1
