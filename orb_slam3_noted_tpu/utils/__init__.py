"""Utilities: synthetic scenes, evaluation, timing."""
