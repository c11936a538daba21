"""Offline tooling: camera/bounds visualization, virtual camera creation."""
