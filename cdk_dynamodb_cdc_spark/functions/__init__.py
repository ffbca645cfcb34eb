"""Scalar / semi-structured function library for the engine.

``dynamo``  — DynamoDB AttributeValue wire-format codec (unmarshall).
``diff``    — recursive structural diff between two JSON documents.
``text``    — text-analysis functions (tokens, language-ID, quality, fingerprints).
``vectors`` — embedding similarity expressions (cosine / dot product).
"""
