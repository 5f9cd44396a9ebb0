"""schemes subpackage."""
