"""Populated in later build phases."""
