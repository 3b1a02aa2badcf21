"""Small shared pipeline utilities."""

from __future__ import annotations

import json
import os


def write_manifest(out_dir: str, manifest: dict,
                   name: str = "manifest.json") -> None:
    """Atomically write a JSON manifest (tmp + rename — the same
    commit-after-data contract as the reference's draft write,
    RunStore.php:20-31)."""
    os.makedirs(out_dir, exist_ok=True)
    tmp = os.path.join(out_dir, f"_{name}.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
    os.replace(tmp, os.path.join(out_dir, name))
