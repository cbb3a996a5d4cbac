"""Readers / fixture generators for gold annotation formats and pages tables."""
