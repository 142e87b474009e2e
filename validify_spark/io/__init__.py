from .audit import AuditedValidationRun, read_audit_log
from .bucketing import exchanges_on, read_bucketed, write_bucketed
from .sources import read_table, write_table

__all__ = ["AuditedValidationRun", "read_audit_log", "read_table",
           "write_bucketed", "read_bucketed", "exchanges_on",
           "write_table"]
