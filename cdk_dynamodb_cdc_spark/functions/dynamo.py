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
  S -> str, N -> int|Decimal (DynamoDB numbers are arbitrary-precision
  decimal strings on the wire; integral values parse to int, anything
  else to ``decimal.Decimal`` — both exact, so a 25-significant-digit
  ``N`` round-trips bit-for-bit; SURVEY §1.2 names DecimalType as the
  faithful mapping), BOOL -> bool, NULL -> None, M -> dict, L -> list,
  SS/NS/BS -> sorted list (sets are unordered on the wire — canonicalize
  so the diff operator sees deterministic values), B -> base64 str.
"""

from __future__ import annotations

import json
from decimal import Decimal
from typing import Any

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T


def parse_number(n: str) -> int | Decimal:
    """DynamoDB ``N`` values are arbitrary-precision decimal strings.

    Integral strings parse to Python int (exact, unbounded) so that e.g.
    an 18-digit id survives round-tripping; anything else parses to
    ``decimal.Decimal`` — exact as well, where a float would silently
    truncate past ~17 significant digits.
    """
    try:
        return int(n)
    except ValueError:
        return Decimal(n)


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
        # int and Decimal order correctly under direct comparison — no
        # float key, which would collapse near-equal high-precision values
        return sorted(parse_number(v) for v in payload)
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


def canonical_decimal(d: Decimal) -> str:
    """Canonical JSON-number text for a Decimal: fixed-point with
    trailing fractional zeros stripped, never exponent notation —
    '1.50' and '1.5' serialize identically, like JS number printing.
    NOT ``normalize()``: that rounds to the 28-digit context precision,
    silently truncating exactly the long values this exists to keep."""
    s = format(d, "f")  # exact: no context rounding
    if "." in s:
        s = s.rstrip("0").rstrip(".")
    return "0" if s in ("-0", "") else s


def dumps_canonical(obj: Any) -> str:
    """Canonical compact JSON (sorted keys) with exact Decimal support.

    ``json.dumps`` cannot emit a Decimal as an unquoted number (its
    ``default`` hook re-serializes), so this is a small recursive
    serializer producing the same bytes as
    ``json.dumps(obj, sort_keys=True, separators=(",", ":"))`` for
    non-Decimal input."""
    return "".join(_canonical_parts(obj))


def _canonical_parts(obj: Any):
    if obj is None or isinstance(obj, (bool, int, float, str)):
        yield json.dumps(obj)
    elif isinstance(obj, Decimal):
        yield canonical_decimal(obj)
    elif isinstance(obj, dict):
        yield "{"
        first = True
        for k in sorted(obj):
            if not first:
                yield ","
            first = False
            yield json.dumps(k)
            yield ":"
            yield from _canonical_parts(obj[k])
        yield "}"
    elif isinstance(obj, (list, tuple)):
        yield "["
        first = True
        for v in obj:
            if not first:
                yield ","
            first = False
            yield from _canonical_parts(v)
        yield "]"
    else:
        raise TypeError(f"not JSON-serializable: {type(obj)}")


@F.pandas_udf(T.StringType())
def unmarshall_udf(s: pd.Series) -> pd.Series:
    """Arrow-vectorized column wrapper for the dynamic lane."""
    return s.map(unmarshall_json, na_action="ignore")
