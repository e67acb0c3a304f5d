"""Host-side constraint reasoning over the device-produced logit tensor.

Capability parity with the reference reasoning layer (reference
pipeline/validator.py, conflict_resolver.py, constraint_resolver.py).
These stay on host by design: beam search and fixpoint propagation are
branchy, tiny (81 cells), and consume the (81, 10) probability tensor the
TPU graph already produced — alternatives are free, no extra device work.
"""

from sudoku_vision_tpu.reasoning.validator import (
    CellInfo, Conflict, ValidationResult, validate_predictions,
    get_conflict_graph, rank_cells_by_conflict_involvement,
    get_possible_values,
)
from sudoku_vision_tpu.reasoning.conflict_resolver import (
    ResolutionResult, resolve_conflicts, resolve_unsolvable,
    resolve_with_solver, restore_erased_givens,
)
from sudoku_vision_tpu.reasoning.constraint_resolver import (
    PropagationResult, resolve_with_constraints,
)

__all__ = [
    "CellInfo", "Conflict", "ValidationResult", "validate_predictions",
    "get_conflict_graph", "rank_cells_by_conflict_involvement",
    "get_possible_values", "ResolutionResult", "resolve_conflicts",
    "PropagationResult", "resolve_with_constraints",
    "resolve_with_solver", "resolve_unsolvable", "restore_erased_givens",
]
