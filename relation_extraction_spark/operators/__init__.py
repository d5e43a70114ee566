"""Distributed operators composed from DataFrame primitives."""
