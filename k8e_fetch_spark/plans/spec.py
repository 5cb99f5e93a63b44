"""Declarative pipeline spec — the engine's analog of cfg.yaml.

The reference's "query language" is a YAML plan
(/root/reference/bin/cfg.yaml): fetch groups (bucket → include regexes,
:1-8) and compressors (table-name regexes → component bindings with
per-(compressor, component) ``subst`` maps, :11-54) over globally
declared component column lists (:56-191). Here the same shape is plain
dataclasses; :func:`from_dict` accepts the equivalent nested-dict form
(what ``yaml.safe_load`` of such a file yields), so a YAML file loads
via an import-guarded helper without requiring a YAML dependency.

Subst values are SQL expression strings exactly as in the reference —
rename (``midl_name``), expression (``area_cd||phone_num``), constant
default (``'NA'``) — applied as ``<expr> AS <col>`` per ``SourceColumns``
(fetcher.bash:163-169; unmapped columns pass through by name via the
``// "$c"`` default).
"""

from __future__ import annotations

from collections.abc import Mapping
from dataclasses import dataclass, field


@dataclass(frozen=True)
class ComponentBinding:
    """One component as fed by one compressor: the compressor's subst
    map over the component's global column list (cfg.yaml:16-34)."""

    component: str
    subst: Mapping[str, str] = field(default_factory=dict)


@dataclass(frozen=True)
class Compressor:
    """Binds table-name regexes to component bindings
    (cfg.yaml:12-54; table binding at fetcher.bash:130-137)."""

    name: str
    table_include: tuple[str, ...]
    bindings: tuple[ComponentBinding, ...]


@dataclass(frozen=True)
class FetchGroup:
    """bucket → include-regex list (cfg.yaml:1-8)."""

    name: str
    buckets: Mapping[str, tuple[str, ...]]


@dataclass(frozen=True)
class PipelineSpec:
    fetch: Mapping[str, FetchGroup]
    components: Mapping[str, tuple[str, ...]]  # global column lists (cfg.yaml:56-191)
    compressors: tuple[Compressor, ...]


def from_dict(d: Mapping) -> PipelineSpec:
    """Build a spec from the cfg.yaml-shaped nested dict."""
    fetch = {}
    for gname, buckets in d.get("fetch", {}).items():
        fetch[gname] = FetchGroup(
            name=gname,
            buckets={
                b: tuple(cfg["include"] if isinstance(cfg, Mapping) else cfg)
                for b, cfg in buckets.items()
            },
        )
    components = {name: tuple(cols) for name, cols in d.get("components", {}).items()}
    compressors = tuple(
        Compressor(
            name=cname,
            table_include=tuple(cfg.get("include", [])),
            bindings=tuple(
                ComponentBinding(
                    component=comp_name,
                    subst=dict(comp.get("subst", {})) if isinstance(comp, Mapping) else {},
                )
                for comp_name, comp in cfg.get("components", {}).items()
            ),
        )
        for cname, cfg in d.get("compress", {}).items()
    )
    return PipelineSpec(fetch=fetch, components=components, compressors=compressors)


def from_yaml(path: str) -> PipelineSpec:  # pragma: no cover - optional dep
    """Load a cfg.yaml-shaped file if a YAML parser is available."""
    try:
        import yaml
    except ImportError as e:
        raise RuntimeError("PyYAML not installed; use from_dict") from e
    with open(path) as f:
        return from_dict(yaml.safe_load(f))


# Default spec over the FIXTURES.md §B raw-text fixtures — the same
# component decomposition cfg.yaml applies to NC voter data: two
# differently-shaped sources (vr_snapshot_* native names vs
# ncvoter_statewide's midl_name/name_sufx_cd) funnel into shared
# dimensions via per-compressor subst, exactly the cfg.yaml:12-54 shape.
DEFAULT_SPEC = from_dict(
    {
        "fetch": {
            "current_cycle": {
                "fixture-bucket": [
                    r"VR_Snapshot_",
                    r"_Statewide\.zip$",
                    r"layout.*txt$",
                    r"Elections/",
                ]
            }
        },
        "components": {
            "c_name": ["ncid", "last_name", "first_name", "middle_name", "name_suffix_lbl"],
            "c_phone": ["ncid", "full_phone_number"],
            "c_status": ["status_cd"],
            "c_registr": ["ncid", "status_cd", "registr_dt"],
        },
        "compress": {
            "a_vr_snapshot": {
                "include": [r"^vr_snapshot"],
                "components": {
                    "c_name": None,  # native column names
                    "c_phone": {"subst": {"full_phone_number": "area_cd||phone_num"}},
                    "c_status": None,
                    "c_registr": {"subst": {"registr_dt": "'NA'"}},
                },
            },
            "a_ncvoter": {
                "include": [r"^ncvoter_statewide$"],
                "components": {
                    "c_name": {
                        "subst": {
                            "middle_name": "midl_name",
                            "name_suffix_lbl": "name_sufx_cd",
                        }
                    },
                    "c_phone": {"subst": {"full_phone_number": "area_cd||phone_num"}},
                    "c_status": None,
                    "c_registr": None,
                },
            },
        },
    }
)
