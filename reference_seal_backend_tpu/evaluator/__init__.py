"""evaluator subpackage."""
