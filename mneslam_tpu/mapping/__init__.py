"""Mapping subsystem: keyframe ray database, online mapper, mesher."""
