"""Dataset→Dataset stages, including stateful actor-pool stages."""
