"""Thematic extension-catalog modules (split from the monolithic
plans/catalog_ext.py in round 10; the shim there preserves the public
surface and legacy ordering)."""
