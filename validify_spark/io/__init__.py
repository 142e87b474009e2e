from .audit import AuditedValidationRun, read_audit_log
from .sources import read_table, write_table

__all__ = ["AuditedValidationRun", "read_audit_log", "read_table",
           "write_table"]
