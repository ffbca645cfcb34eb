"""DynamoDB AttributeValue wire-format codec.

The reference pipeline's first transform deserializes the DynamoDB
AttributeValue encoding (``{"S": ...}``, ``{"N": "1.5"}``, ``{"M": {...}}``,
``{"L": [...]}`` ...) into plain JSON before diffing
(``/root/reference/lib/lambda/dynamo-stream-handler.ts:101-110``, which
delegates to the public ``@aws-sdk/util-dynamodb`` ``unmarshall``).

This module is the Spark-native equivalent: a pure-Python codec (unit
testable without a JVM) plus Arrow-vectorized pandas-UDF wrappers used in
the dynamic-schema lane. The typed lane never needs this — a declared
StructType lets ``from_json`` + column expressions do the work JVM-side.

Type mapping (SURVEY.md §1.2):
  S -> str, N -> int|float (DynamoDB numbers are decimal strings on the
  wire; integral values parse to int for fidelity, else float),
  BOOL -> bool, NULL -> None, M -> dict, L -> list,
  SS/NS/BS -> sorted list (sets are unordered on the wire — canonicalize
  so the diff operator sees deterministic values), B -> base64 str.
"""

from __future__ import annotations

import json
from typing import Any

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T


def parse_number(n: str) -> int | float:
    """DynamoDB ``N`` values are arbitrary-precision decimal strings.

    Integral strings parse to Python int (exact, unbounded) so that e.g.
    an 18-digit id survives round-tripping; anything else parses to float.
    """
    try:
        return int(n)
    except ValueError:
        return float(n)


def unmarshall_value(av: Any) -> Any:
    """Convert one AttributeValue node ``{tag: payload}`` to plain JSON."""
    if not isinstance(av, dict) or len(av) != 1:
        raise ValueError(f"not an AttributeValue: {av!r}")
    tag, payload = next(iter(av.items()))
    if tag == "S":
        return payload
    if tag == "N":
        return parse_number(payload)
    if tag == "BOOL":
        return bool(payload)
    if tag == "NULL":
        return None
    if tag == "M":
        return {k: unmarshall_value(v) for k, v in payload.items()}
    if tag == "L":
        return [unmarshall_value(v) for v in payload]
    if tag == "SS":
        return sorted(payload)
    if tag == "NS":
        return sorted((parse_number(v) for v in payload), key=float)
    if tag == "BS":
        return sorted(payload)
    if tag == "B":
        return payload  # already base64 text on the JSON wire
    raise ValueError(f"unknown AttributeValue tag: {tag!r}")


def unmarshall(item: dict[str, Any] | None) -> dict[str, Any] | None:
    """Unmarshall a whole item: map of attribute name -> AttributeValue."""
    if item is None:
        return None
    return {k: unmarshall_value(v) for k, v in item.items()}


def unmarshall_json(marshalled: str | None) -> str | None:
    """String-to-string unmarshall: wire JSON in, canonical plain JSON out.

    Canonical form = sorted keys, compact separators, so equal documents
    always serialize identically (needed by the diff's atomic array
    comparison and by exact-dedup on payloads).
    """
    if marshalled is None:
        return None
    return dumps_canonical(unmarshall(json.loads(marshalled)))


def dumps_canonical(obj: Any) -> str:
    return json.dumps(obj, sort_keys=True, separators=(",", ":"))


@F.pandas_udf(T.StringType())
def unmarshall_udf(s: pd.Series) -> pd.Series:
    """Arrow-vectorized column wrapper for the dynamic lane."""
    return s.map(unmarshall_json, na_action="ignore")
