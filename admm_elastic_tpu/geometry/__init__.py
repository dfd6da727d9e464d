"""Host-side geometry: meshes, IO, shape factories, transforms."""
