"""Multi-device execution: meshes, shardings and collective reductions."""
