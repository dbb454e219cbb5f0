"""QuestDB SQL dialect front-end (see :mod:`.dialect`)."""

from questdb_etl_jobs_spark.sql.dialect import (
    QuestDBSQLError,
    questdb_ddl,
    questdb_show,
    questdb_sql,
)

__all__ = ["QuestDBSQLError", "questdb_ddl", "questdb_show", "questdb_sql"]
