"""validify_spark — a PySpark-native schema + constraint validation engine.

A from-scratch reimplementation of the rule surface of biblius/validify
(Rust derive-macro validator, /root/reference) lifted from "one struct in
memory" to distributed tables: every declarative rule compiles to
vectorized Spark SQL predicates (Arrow pandas UDFs only where SQL cannot
express the semantics), evaluated in a single fused projection per table
scan, emitting a violations DataFrame with reference-compatible codes,
locations and params — plus the distributed-only checks the reference
cannot express (column stats profiles, uniqueness, referential integrity,
distribution drift) and training-data pipeline operators (dedup,
similarity search, text analysis).
"""

from .engine import ValidationEngine, ValidationResult, validate
from .payload import validate_json_payload
from .rules import (
    Modifier,
    Rule,
    RuleSet,
    RuleSpecError,
    capitalize,
    contains,
    contains_not,
    credit_card,
    custom,
    custom_modifier,
    email,
    ip,
    is_in,
    iter_,
    length,
    lowercase,
    map_values_,
    must_match,
    non_control_char,
    not_in,
    phone,
    range_,
    regex,
    rename_all,
    required,
    schema_rule,
    time,
    trim,
    uppercase,
    url,
    variant_modifiers,
    variant_rules,
)
from .session import get_spark
from .spec import (
    ruleset_from_json,
    ruleset_from_spec,
    ruleset_from_yaml,
    ruleset_to_spec,
)

__version__ = "0.1.0"

__all__ = [
    "ValidationEngine", "ValidationResult", "validate", "get_spark",
    "validate_json_payload",
    "Rule", "RuleSet", "RuleSpecError", "Modifier",
    "length", "range_", "email", "url", "ip", "phone", "credit_card",
    "non_control_char", "required", "regex", "contains", "contains_not",
    "is_in", "not_in", "must_match", "custom", "time", "iter_",
    "map_values_",
    "schema_rule", "variant_rules", "variant_modifiers", "trim",
    "lowercase", "uppercase", "capitalize", "custom_modifier",
    "ruleset_from_spec", "ruleset_from_json", "ruleset_from_yaml",
    "ruleset_to_spec", "rename_all",
]
