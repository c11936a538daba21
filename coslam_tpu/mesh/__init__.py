"""Mesh extraction: marching cubes (native C++), SDF grid query, PLY io."""
