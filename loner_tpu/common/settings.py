"""Config system: YAML with ``!include``, dotted overlays, ablation sweeps.

Re-implements the semantics of the reference's Settings/SettingsLoader
(reference: src/common/settings.py:22-196) without the abandoned
``attrdict`` dependency: a dict subclass with attribute access, an
``!include`` YAML constructor resolved relative to the including file, an
``augment`` deep-overlay, and ``generate_options`` producing either
one-at-a-time or full cross-product ablation variants from an overrides
file — this is load-bearing for the ablation configs
(cfg/ablation_study.yaml, cfg/kf_selection_ablation.yaml).
"""
from __future__ import annotations

import copy
import itertools
import os
from typing import Any, List, Optional, Tuple

import yaml


class Settings(dict):
    """Dict with recursive attribute access. Nested dicts are wrapped lazily."""

    def __getattr__(self, name: str) -> Any:
        try:
            value = self[name]
        except KeyError as e:
            raise AttributeError(name) from e
        if isinstance(value, dict) and not isinstance(value, Settings):
            value = Settings(value)
            self[name] = value
        return value

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    def __deepcopy__(self, memo):
        return Settings({k: copy.deepcopy(v, memo) for k, v in self.items()})

    # -- IO -------------------------------------------------------------------
    @staticmethod
    def load_from_file(filename: str) -> "Settings":
        return Settings(_load_yaml_with_includes(filename))

    def as_plain_dict(self) -> dict:
        def conv(v):
            if isinstance(v, dict):
                return {k: conv(val) for k, val in v.items()}
            if isinstance(v, (list, tuple)):
                return [conv(x) for x in v]
            return v

        return conv(self)

    def dump(self, filename: str) -> None:
        with open(filename, "w") as f:
            yaml.safe_dump(self.as_plain_dict(), f, sort_keys=False)

    # -- overlays --------------------------------------------------------------
    def augment(self, changes: Optional[dict]) -> "Settings":
        """Apply a (possibly nested) change dict onto self, in place."""
        if changes is None:
            return self
        for path, value in generate_change_list(changes):
            node = self
            for attr in path[:-1]:
                if attr not in node:
                    node[attr] = {}  # overlays may introduce new sections
                node = node[attr]
            node[path[-1]] = value
        return self


class _IncludeLoader(yaml.SafeLoader):
    """SafeLoader that resolves ``!include other.yaml`` relative to the file."""

    def __init__(self, stream):
        self._root = os.path.split(getattr(stream, "name", "."))[0]
        super().__init__(stream)


def _include(loader: _IncludeLoader, node):
    fname = os.path.join(loader._root, loader.construct_scalar(node))
    return _load_yaml_with_includes(fname)


_IncludeLoader.add_constructor("!include", _include)


def _load_yaml_with_includes(filename: str):
    with open(os.path.expanduser(filename), "r") as f:
        return yaml.load(f, _IncludeLoader)


def generate_change_list(changes: dict) -> List[Tuple[Tuple[str, ...], Any]]:
    """Flatten a nested change dict to [(path_tuple, leaf_value), ...]."""
    options: List[Tuple[Tuple[str, ...], Any]] = []

    def walk(data, stack):
        if not isinstance(data, dict):
            options.append((tuple(stack), data))
            return
        for key in data:
            walk(data[key], stack + [key])

    walk(changes, [])
    return options


def generate_options(
    filename: str,
    overrides: Optional[str],
    run_all_combos: bool = False,
    augmentations: Optional[List[dict]] = None,
) -> Tuple[List[Settings], List[str]]:
    """Build ablation variants from a baseline config and an overrides file.

    Same contract as the reference (settings.py:77-196): when
    ``run_all_combos`` is False, vary one setting at a time; otherwise take
    the cross-product of all overridden values. Each overrides document in
    the file contributes its own variants.
    """
    baseline = Settings.load_from_file(filename)
    for changes in augmentations or []:
        baseline.augment(changes)

    if overrides is None:
        return [baseline], [""]

    with open(os.path.expanduser(overrides)) as f:
        overrides_docs = yaml.safe_load(f)
    if not isinstance(overrides_docs, list):
        overrides_docs = [overrides_docs]

    all_options: List[Settings] = []
    all_descriptions: List[str] = []

    for doc in overrides_docs:
        if doc is None:
            continue
        options = [
            (path, values if isinstance(values, list) else [values])
            for path, values in generate_change_list(doc)
        ]
        if run_all_combos:
            paths = [o[0] for o in options]
            value_lists = [o[1] for o in options]
            for combo in itertools.product(*value_lists):
                variant = copy.deepcopy(baseline)
                desc_parts = []
                for path, value in zip(paths, combo):
                    node = variant
                    for attr in path[:-1]:
                        node = node[attr]
                    node[path[-1]] = value
                    desc_parts.append(f"{'.'.join(path)}={value}")
                all_options.append(variant)
                all_descriptions.append("\n".join(desc_parts) + "\n")
        else:
            for path, values in options:
                # A list-of-lists leaf is a single list-valued setting.
                if values and isinstance(values[0], list):
                    values = [values]
                for value in values:
                    variant = copy.deepcopy(baseline)
                    node = variant
                    for attr in path[:-1]:
                        node = node[attr]
                    node[path[-1]] = value
                    all_options.append(variant)
                    all_descriptions.append(f"{'.'.join(path)}={value}")

    if not all_options:
        return [baseline], [""]
    return all_options, all_descriptions
