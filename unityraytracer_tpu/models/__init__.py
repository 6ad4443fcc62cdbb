"""Scene content: primitive meshes, loaders, reference scene fixtures."""
