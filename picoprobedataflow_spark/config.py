"""Engine configuration — SURVEY §2.1 S9 (YAML ⇄ typed config).

The reference binds pydantic models from YAML
(``BaseModel.from_yaml``, picoprobe/utils.py:21-32; flow config at
examples/hyperspectral_flow/main.py:36-41). Dataclasses + pyyaml give
the same typed-record contract without the pydantic dependency; yaml
is import-gated so the engine core never requires it.
"""

from __future__ import annotations

from dataclasses import asdict, dataclass, field, fields
from pathlib import Path

try:
    import yaml

    HAS_YAML = True
except Exception:  # pragma: no cover
    yaml = None
    HAS_YAML = False


@dataclass
class FlowConfig:
    """The watch→analyze→publish flow parameters (the Spark twin of
    ``PicoProbeFlowConfig``: local endpoints/dirs become paths; the
    remote endpoint ids disappear — Spark's scheduler owns placement)."""

    input_dir: str
    glob: str = "*.emd"
    catalog_path: str | None = None
    checkpoint_dir: str | None = None
    exp_type: str = "hyperspectral_imaging"
    max_files_per_trigger: int | None = None
    extra_spark_conf: dict[str, str] = field(default_factory=dict)

    @classmethod
    def from_yaml(cls, path: str | Path) -> "FlowConfig":
        if not HAS_YAML:  # pragma: no cover
            raise NotImplementedError("pyyaml not installed")
        with open(path) as f:
            raw = yaml.safe_load(f) or {}
        known = {f.name for f in fields(cls)}
        unknown = set(raw) - known
        if unknown:
            raise ValueError(f"unknown config keys: {sorted(unknown)}")
        return cls(**raw)

    def to_yaml(self, path: str | Path) -> None:
        if not HAS_YAML:  # pragma: no cover
            raise NotImplementedError("pyyaml not installed")
        with open(path, "w") as f:
            yaml.safe_dump(asdict(self), f, sort_keys=True)
