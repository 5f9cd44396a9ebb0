"""ops/pallas subpackage."""
