"""Host-side learning-rate schedulers.

JAX equivalents of the torch schedulers the reference models use.
The schedule state lives on the host (in the model family object) and
is serialized through ``BreverBaseModel.extra_state``; the learning
rate itself is a mutable optax hyperparameter
(``optax.inject_hyperparams``) so updating it never resets the
optimizer moments.
"""


class ReduceLROnPlateau:
    """Halve (by ``factor``) when the monitored value stops improving
    for ``patience`` validations (torch ReduceLROnPlateau semantics,
    used by TF-GridNet — reference tfgridnet.py:162-178)."""

    def __init__(self, init_lr, factor=0.5, patience=3, mode='min'):
        self.lr = init_lr
        self.factor = factor
        self.patience = patience
        self.mode = mode
        self.best = None
        self.num_bad = 0

    def step(self, value):
        """Returns the new learning rate if it changed, else None."""
        value = float(value)
        improved = (
            self.best is None
            or (self.mode == 'min' and value < self.best)
            or (self.mode == 'max' and value > self.best)
        )
        if improved:
            self.best = value
            self.num_bad = 0
            return None
        self.num_bad += 1
        if self.num_bad > self.patience:
            self.lr *= self.factor
            self.num_bad = 0
            return self.lr
        return None

    def state_dict(self):
        return {
            'lr': self.lr,
            'best': self.best,
            'num_bad': self.num_bad,
        }

    def load_state_dict(self, state):
        self.lr = state['lr']
        self.best = state['best']
        self.num_bad = state['num_bad']
