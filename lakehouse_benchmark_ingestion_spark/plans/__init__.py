from .lineage import LineageLog, LineageRow

# run_full_maintenance lives in .maintenance; import it from there directly
# (importing it here would cycle through operators/ at package-init time).

__all__ = ["LineageLog", "LineageRow"]
