"""JSON-Schema Draft 4/6/7 validation gate.

Public surface mirrors the reference API (reference src/JSONSchema.jl:12
`export Schema, validate`):

  Schema(schema)            — compile (parse + $ref inline), driver-side
  validate(schema, x)       — single instance -> Issue | None
  is_valid(schema, x)       — bool
  diagnose(x, schema)       — failure text (reference src/JSONSchema.jl:17-28)
  apply_gate(df, schema)    — DataFrame transform adding `issue` + `isvalid`
"""

from jsonschema_jl_spark.gate.schema import Schema
from jsonschema_jl_spark.gate.validator import Issue, validate, is_valid, diagnose
from jsonschema_jl_spark.gate.gate import GateMetrics, apply_gate, gate_filter

__all__ = ["Schema", "Issue", "validate", "is_valid", "diagnose", "apply_gate", "gate_filter", "GateMetrics"]
