"""String-keyed registries for pluggable components.

Re-creates the capability of the reference's AllenNLP `Registrable`
system (`/root/reference/ttl/tell/models/decoder_flattened.py:22`,
`.../modules/criteria/base.py:5`) without the AllenNLP dependency:
every pluggable piece (model, decoder, criterion, tokenizer, dataset,
trainer callback) registers under a string name so YAML configs can
select implementations.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Generic, TypeVar

T = TypeVar("T")


class Registry(Generic[T]):
    """A named registry mapping string keys to factories/classes."""

    _registries: Dict[str, "Registry"] = {}

    def __init__(self, name: str):
        self.name = name
        self._entries: Dict[str, T] = {}
        Registry._registries[name] = self

    @classmethod
    def get_registry(cls, name: str) -> "Registry":
        if name not in cls._registries:
            Registry(name)
        return cls._registries[name]

    def register(self, key: str, overwrite: bool = False) -> Callable[[T], T]:
        def deco(obj: T) -> T:
            if key in self._entries and not overwrite:
                raise KeyError(f"{key!r} already registered in {self.name!r}")
            self._entries[key] = obj
            return obj

        return deco

    def get(self, key: str) -> T:
        if key not in self._entries:
            raise KeyError(
                f"{key!r} not found in registry {self.name!r}. "
                f"Available: {sorted(self._entries)}"
            )
        return self._entries[key]

    def __contains__(self, key: str) -> bool:
        return key in self._entries

    def keys(self):
        return sorted(self._entries)

    def build(self, key: str, *args: Any, **kwargs: Any) -> Any:
        """Instantiate the registered class/factory with the given args."""
        return self.get(key)(*args, **kwargs)


# Canonical registries used across the framework.
MODELS: Registry = Registry("models")
DECODERS: Registry = Registry("decoders")
CRITERIA: Registry = Registry("criteria")
TOKENIZERS: Registry = Registry("tokenizers")
DATASETS: Registry = Registry("datasets")
EMBEDDERS: Registry = Registry("embedders")
TRAINERS: Registry = Registry("trainers")
