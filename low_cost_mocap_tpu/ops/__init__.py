"""Pure fixed-shape JAX ops: the numeric core of the framework."""
