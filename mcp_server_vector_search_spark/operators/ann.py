"""Placeholder — filled in by subsequent milestones."""
