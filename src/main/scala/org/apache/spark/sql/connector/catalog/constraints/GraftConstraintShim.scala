package org.apache.spark.sql.connector.catalog.constraints

import org.apache.spark.sql.connector.expressions.NamedReference

/** Bridge into the constraint builders: `BaseConstraint.Builder` (the
  * shared `enforced`/`rely`/`validationStatus` half of every builder)
  * is package-private, so a catalog outside this package can CONSUME
  * constraints but not REBUILD them from persisted state. The minimal
  * shim a connector that persists constraints needs — same sanctioned
  * shape as [[org.apache.spark.sql.GraftShims]]. */
object GraftConstraintShim {
  def check(name: String, predicateSql: String, enforced: Boolean,
            rely: Boolean, status: Constraint.ValidationStatus): Check =
    Constraint.check(name).predicateSql(predicateSql)
      .enforced(enforced).rely(rely).validationStatus(status).build()

  def primaryKey(name: String, columns: Array[NamedReference],
                 enforced: Boolean, rely: Boolean,
                 status: Constraint.ValidationStatus): PrimaryKey =
    Constraint.primaryKey(name, columns)
      .enforced(enforced).rely(rely).validationStatus(status).build()

  def unique(name: String, columns: Array[NamedReference],
             enforced: Boolean, rely: Boolean,
             status: Constraint.ValidationStatus): Unique =
    Constraint.unique(name, columns)
      .enforced(enforced).rely(rely).validationStatus(status).build()
}
