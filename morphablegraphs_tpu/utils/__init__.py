"""Utilities: synthetic fixtures, config, exceptions, logging."""
