"""Scene representation models (joint encoding + SDF/color decoders)."""
