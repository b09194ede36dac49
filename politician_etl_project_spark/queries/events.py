"""Populated incrementally — see queries/__init__.load_all."""
