"""Per-stage timing, run statistics, and the performance report/analyzer."""
