"""Named validation-rule config registry — the file-backed analog of the
reference's /config/validation-rules CRUD surface
(src/api/routes/config.py:40-160: create / list / get / update / delete
named ValidationConfig documents; the reference stores them in a
process-local dict, "use database in production").

Here a registry is a directory of ``<config_name>.json`` documents in
the ``load_rule_config`` schema. Every write VALIDATES the document by
applying it to the default config first — a registry can never hold a
config that would fail at job time — and goes through tmp+rename so
readers never observe partial JSON. ``run/job.py --rules`` accepts
either a bare file path or ``<store_dir>:<config_name>``-style usage by
passing ``path_of(store, name)``.
"""

from __future__ import annotations

import json
import os

from .config import DEFAULT_CONFIG, PipelineConfig, load_rule_config

_SUFFIX = ".json"


def _path(store_dir: str, name: str) -> str:
    if not name or "/" in name or name.startswith("."):
        raise ValueError(f"invalid config name: {name!r}")
    return os.path.join(store_dir, name + _SUFFIX)


def save_config(store_dir: str, doc: dict, overwrite: bool = False) -> str:
    """Create (or with overwrite=True, replace) a named config.
    → the stored file path. Raises on invalid rule names / parameters
    (same checks as load time) or on a duplicate name without overwrite."""
    name = doc.get("config_name")
    path = _path(store_dir, name)
    if os.path.exists(path) and not overwrite:
        raise FileExistsError(f"config {name!r} already exists")
    os.makedirs(store_dir, exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(doc, f, indent=2)
    try:
        load_rule_config(tmp)  # validate before publishing
    except Exception:
        os.remove(tmp)
        raise
    os.replace(tmp, path)
    return path


def update_config(store_dir: str, name: str, doc: dict) -> str:
    """PUT analog: replace an existing named config (404 → KeyError)."""
    if not os.path.exists(_path(store_dir, name)):
        raise KeyError(f"config {name!r} not found")
    doc = {**doc, "config_name": name}
    return save_config(store_dir, doc, overwrite=True)


def list_configs(store_dir: str) -> list[dict]:
    """→ [{config_name, description, rules_count}] for every stored config."""
    out = []
    if not os.path.isdir(store_dir):
        return out
    for fn in sorted(os.listdir(store_dir)):
        if not fn.endswith(_SUFFIX):
            continue
        with open(os.path.join(store_dir, fn)) as f:
            doc = json.load(f)
        out.append(
            {
                "config_name": doc.get("config_name", fn[: -len(_SUFFIX)]),
                "description": doc.get("description"),
                "rules_count": len(doc.get("rules", [])),
            }
        )
    return out


def get_config(store_dir: str, name: str) -> dict:
    path = _path(store_dir, name)
    if not os.path.exists(path):
        raise KeyError(f"config {name!r} not found")
    with open(path) as f:
        return json.load(f)


def delete_config(store_dir: str, name: str) -> None:
    path = _path(store_dir, name)
    if not os.path.exists(path):
        raise KeyError(f"config {name!r} not found")
    os.remove(path)


def resolve_config(store_dir: str, name: str, base: PipelineConfig = DEFAULT_CONFIG) -> PipelineConfig:
    """Load a named config applied over ``base`` — what a job passes to
    the pipeline."""
    return load_rule_config(_path(store_dir, name), base)
