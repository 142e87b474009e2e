"""Declarative, serializable rule specs — the config-driven surface.

The reference lets rule parameters reference named constants by path
(validify_derive/src/parser.rs:100-107; derive_tests/tests/length.rs:
25-52, in.rs:185-208 use `length(min = SOME_CONST)`). The Spark-native
analog: a plain-dict spec (JSON/YAML-friendly) with ``$NAME`` constant
references, compiled to a :class:`RuleSet` by :func:`ruleset_from_spec`
— so rulesets can live in config files / tables next to the pipelines
they validate, and round-trip via :func:`ruleset_to_spec`.

Spec shape::

    {"name": "turns",
     "constants": {"MAX_LEN": 4000, "ROLES": ["user", "assistant"]},
     "modifiers": [{"kind": "trim", "column": "text"}],
     "rules": [
       {"kind": "length", "column": "text", "min": 1, "max": "$MAX_LEN"},
       {"kind": "is_in", "column": "role", "values": "$ROLES"},
       {"kind": "time", "column": "ts", "op": "before",
        "target": "2030-01-01T00:00:00"},
       {"kind": "iter", "column": "emails", "inner": {"kind": "email"}},
       {"kind": "schema", "predicate": "l_tax >= 0", "code": "tax"},
     ]}

``custom`` rules/modifiers (Python callables) are inherently
non-serializable: ``ruleset_from_spec`` resolves them from the
``custom_registry`` argument by name, mirroring how the reference names
custom functions in attributes (`custom(my_fn)`).
"""

from __future__ import annotations

import datetime as _dt
import json
from typing import Any, Callable, Optional

from .rules import (
    Modifier,
    Rule,
    RuleSet,
    RuleSpecError,
    TIME_OPS,
)

_DURATION_KEYS = ("seconds", "minutes", "hours", "days", "weeks")

# rule-level (non-param) keys
_META_KEYS = {"kind", "column", "code", "message", "display_name",
              "stage", "rule_id"}


def _resolve(value: Any, constants: dict) -> Any:
    """Resolve ``$NAME`` strings against the constants table (named-
    constant analog of parser.rs const paths); recurse into lists."""
    if isinstance(value, str) and value.startswith("$"):
        name = value[1:]
        if name not in constants:
            raise RuleSpecError(f"unknown constant {value}")
        return constants[name]
    if isinstance(value, list):
        return [_resolve(v, constants) for v in value]
    return value


def _parse_time_target(params: dict) -> None:
    """String targets: with an explicit strptime ``format`` keep the
    reference behavior (parse-checked in the sanity pass); without one,
    accept ISO-8601."""
    tgt = params.get("target")
    if isinstance(tgt, str) and not params.get("format"):
        try:
            params["target"] = _dt.datetime.fromisoformat(tgt)
        except ValueError as e:
            raise RuleSpecError(
                f"time: target {tgt!r} is not ISO-8601 and no "
                f"format was given") from e


def _rule_from_dict(d: dict, constants: dict,
                    custom_registry: dict) -> Rule:
    d = dict(d)
    kind = d.get("kind")
    if not kind:
        raise RuleSpecError("rule spec needs 'kind'")
    meta = {k: d.pop(k) for k in list(d) if k in _META_KEYS}
    meta.pop("kind", None)
    params = {k: _resolve(v, constants) for k, v in d.items()}

    if kind in ("iter", "map_values"):
        inner = params.pop("inner", None)
        if not isinstance(inner, dict):
            raise RuleSpecError(f"{kind}: needs an 'inner' rule dict")
        params["inner"] = _rule_from_dict(inner, constants,
                                          custom_registry)
    elif kind == "time":
        op = params.get("op")
        if op not in TIME_OPS:
            raise RuleSpecError(f"time: unknown op {op}")
        dur = sum(
            {"seconds": 1, "minutes": 60, "hours": 3600, "days": 86400,
             "weeks": 604800}[k] * params.pop(k)
            for k in list(params) if k in _DURATION_KEYS)
        params.setdefault("interval_seconds", dur)
        params.setdefault("inclusive", False)
        params.setdefault("target", None)
        params.setdefault("target_column", None)
        params.setdefault("format", None)
        _parse_time_target(params)
    elif kind == "custom":
        fn_name = params.pop("function", None)
        if fn_name is None or fn_name not in custom_registry:
            raise RuleSpecError(
                f"custom rule needs 'function' naming an entry in "
                f"custom_registry (got {fn_name!r})")
        params["builder"] = custom_registry[fn_name]
        params["function"] = fn_name  # kept for round-trip
    elif kind == "length":
        for k in ("min", "max", "equal"):
            params.setdefault(k, None)
    elif kind == "range":
        for k in ("min", "max"):
            params.setdefault(k, None)
    elif kind == "ip":
        params.setdefault("format", None)

    return Rule(kind=kind, column=meta.pop("column", None),
                params=params, **meta)


def _modifier_from_dict(d: dict, custom_registry: dict) -> Modifier:
    d = dict(d)
    kind = d.get("kind")
    if kind == "custom":
        fn_name = d.get("function")
        if fn_name is None or fn_name not in custom_registry:
            raise RuleSpecError(
                f"custom modifier needs 'function' in custom_registry "
                f"(got {fn_name!r})")
        return Modifier("custom", d["column"],
                        fn=custom_registry[fn_name],
                        gate=d.get("gate"))
    return Modifier(kind, d["column"], gate=d.get("gate"))


def ruleset_from_spec(spec: dict,
                      custom_registry: Optional[dict] = None) -> RuleSet:
    """Build a RuleSet from a plain-dict spec (see module docstring).
    Runs the same sanity pass as the Python factory surface."""
    reg = custom_registry or {}
    constants = spec.get("constants", {})
    rules = [_rule_from_dict(r, constants, reg)
             for r in spec.get("rules", [])]
    modifiers = [_modifier_from_dict(m, reg)
                 for m in spec.get("modifiers", [])]
    return RuleSet(rules=rules, modifiers=modifiers,
                   name=spec.get("name", "ruleset"))


def ruleset_from_json(text: str,
                      custom_registry: Optional[dict] = None) -> RuleSet:
    return ruleset_from_spec(json.loads(text), custom_registry)


def ruleset_from_yaml(text: str,
                      custom_registry: Optional[dict] = None) -> RuleSet:
    """YAML front-end (PyYAML is optional in this environment)."""
    try:
        import yaml  # type: ignore
    except ImportError as e:  # pragma: no cover
        raise RuleSpecError(
            "PyYAML is not installed; use ruleset_from_json") from e
    return ruleset_from_spec(yaml.safe_load(text), custom_registry)


def _rule_to_dict(r: Rule) -> dict:
    out: dict = {"kind": r.kind}
    if r.column is not None:
        out["column"] = r.column
    for k in ("code", "message", "display_name"):
        v = getattr(r, k)
        if v is not None:
            out[k] = v
    if r.stage != "main":
        out["stage"] = r.stage
    for k, v in r.params.items():
        if k == "inner" and isinstance(v, Rule):
            out["inner"] = _rule_to_dict(v)
        elif k == "builder":
            continue  # callables serialize via their registry name
        elif k == "predicate" and callable(v):
            raise RuleSpecError(
                "schema rule with a callable predicate cannot be "
                "serialized — use a SQL-string predicate")
        elif isinstance(v, _dt.datetime):
            out[k] = v.isoformat()
        elif v is not None:
            out[k] = v
    return out


def ruleset_to_spec(rs: RuleSet) -> dict:
    """Serialize a RuleSet back to the plain-dict spec form (constants
    are already folded). Custom rules keep their registry name under
    ``function``; custom modifiers cannot round-trip without one."""
    mods = []
    for m in rs.modifiers:
        if m.kind == "custom":
            raise RuleSpecError(
                "custom modifiers cannot be serialized (no registry "
                "name on Modifier)")
        d = {"kind": m.kind, "column": m.column}
        if m.gate:
            d["gate"] = m.gate
        mods.append(d)
    return {
        "name": rs.name,
        "modifiers": mods,
        "rules": [_rule_to_dict(r) for r in rs.rules],
    }
