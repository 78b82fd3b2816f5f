"""Enum-keyed SoA variable storage.

TPU-native counterpart of the reference `MemoryManager<VariableList,
StepList>` (`t8gpu/memory/memory_manager.h:327`): all (step, variable)
fields live in ONE SoA buffer plus a per-element volume field, keyed by
user-defined IntEnums.  Differences by design:

  * storage is a single jax.Array of shape [n_steps, n_vars, capacity]
    (the reference packs `nb_steps*nb_vars + 1` fields into one
    SharedDeviceVector, memory_manager.h:460; the volume lives in its own
    array here since it has different update cadence),
  * updates are functional — `set` returns a new store; under jit with
    donation XLA performs them in place,
  * `resize` pads to a capacity bucket (growth factor 1.5, mirroring
    `shared_device_vector.inl:85`) so element-count changes from AMR do
    not retrigger XLA compilation at every adapt; like the reference,
    resize DOES NOT preserve contents (`shared_device_vector.h:31-40`) —
    callers gather old data into fresh arrays and install them,
  * there is no `MemoryAccessorAll` / CUDA-IPC analogue: remote element
    data is materialized locally by halo exchange (see parallel/halo.py).

Example::

    class Var(enum.IntEnum):
        Rho = 0; Rho_v1 = 1; Rho_v2 = 2; Rho_v3 = 3; Rho_e = 4

    class Step(enum.IntEnum):
        Prev = 0; Next = 1; Fluxes = 2

    store = VariableStore.create(Var, Step, n_elements=1000)
    store = store.set(Step.Prev, Var.Rho, jnp.ones(1000))
    rho   = store.get(Step.Prev, Var.Rho)
"""

from __future__ import annotations

import dataclasses
import enum
import math
from typing import Sequence, Type

import jax
import jax.numpy as jnp
import numpy as np


def bucket_capacity(n: int, growth: float = 1.5, base: int = 256) -> int:
    """Smallest capacity bucket >= n on a geometric grid of ratio `growth`.

    Keeping capacities on a fixed geometric grid bounds the number of
    distinct XLA programs compiled over a run (the TPU analogue of the
    reference's 1.5x realloc growth, shared_device_vector.inl:85).
    """
    if n <= base:
        return base
    k = math.ceil(math.log(n / base) / math.log(growth))
    cap = int(round(base * growth**k))
    while cap < n:  # guard rounding
        cap = int(round(cap * growth))
    return cap


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class VariableStore:
    """SoA (step x variable x element) storage with a volume field."""

    data: jnp.ndarray    # [n_steps, n_vars, capacity]
    volume: jnp.ndarray  # [capacity]
    n_elements: int = dataclasses.field(metadata=dict(static=True))

    # ---- construction ----------------------------------------------------

    @staticmethod
    def create(variables: Type[enum.IntEnum] | int,
               steps: Type[enum.IntEnum] | int,
               n_elements: int,
               dtype=jnp.float32,
               growth: float = 1.5) -> "VariableStore":
        n_vars = variables if isinstance(variables, int) else len(variables)
        n_steps = steps if isinstance(steps, int) else len(steps)
        cap = bucket_capacity(n_elements, growth)
        return VariableStore(
            data=jnp.zeros((n_steps, n_vars, cap), dtype),
            volume=jnp.zeros((cap,), dtype),
            n_elements=n_elements,
        )

    # ---- shape info --------------------------------------------------------

    @property
    def capacity(self) -> int:
        return self.data.shape[-1]

    @property
    def n_steps(self) -> int:
        return self.data.shape[0]

    @property
    def n_vars(self) -> int:
        return self.data.shape[1]

    # ---- accessors (ref MemoryAccessorOwn, memory_manager.h:113-170) ------

    def get(self, step: int, var: int | Sequence[int]) -> jnp.ndarray:
        """One variable [capacity] or several [len(vars), capacity]."""
        if isinstance(var, (list, tuple)):
            return self.data[step, jnp.asarray([int(v) for v in var])]
        return self.data[step, int(var)]

    def get_step(self, step: int) -> jnp.ndarray:
        """All variables of one step: [n_vars, capacity]."""
        return self.data[step]

    def get_volume(self) -> jnp.ndarray:
        return self.volume

    # ---- functional updates (ref set_variable/set_volume h:350-385) -------

    def set(self, step: int, var: int, values: jnp.ndarray) -> "VariableStore":
        values = self._fit(values)
        return dataclasses.replace(self, data=self.data.at[step, int(var)].set(values))

    def set_step(self, step: int, values: jnp.ndarray) -> "VariableStore":
        """Install all variables of one step; values [n_vars, n_elements]."""
        values = jax.vmap(self._fit)(values)
        return dataclasses.replace(self, data=self.data.at[step].set(values))

    def set_volume(self, values: jnp.ndarray) -> "VariableStore":
        return dataclasses.replace(self, volume=self._fit(values))

    def _fit(self, values: jnp.ndarray) -> jnp.ndarray:
        """Pad [n_elements] values to [capacity]."""
        values = jnp.asarray(values, self.data.dtype)
        if values.shape[-1] == self.capacity:
            return values
        pad = self.capacity - values.shape[-1]
        return jnp.pad(values, [(0, pad)])

    # ---- resize (ref MemoryManager::resize h:441-457) ----------------------

    def resize(self, n_elements: int, growth: float = 1.5) -> "VariableStore":
        """New store for `n_elements`; contents are NOT preserved (matching
        the reference contract, shared_device_vector.h:31-40)."""
        cap = bucket_capacity(n_elements, growth)
        if cap == self.capacity:
            return dataclasses.replace(self, n_elements=n_elements)
        return VariableStore(
            data=jnp.zeros((self.n_steps, self.n_vars, cap), self.data.dtype),
            volume=jnp.zeros((cap,), self.data.dtype),
            n_elements=n_elements,
        )

    # ---- element mask -------------------------------------------------------

    def element_mask(self) -> jnp.ndarray:
        """[capacity] float mask: 1 for live elements, 0 for padding."""
        return (np.arange(self.capacity) < self.n_elements).astype(np.float32)
