package graft.features

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.QueryKit.r6

/** Regression-based imputation (ref: EDA cells 50-59: fit
  * log(release_clause) ~ log(value) on the present rows, exp-fill the
  * missing ones).
  *
  * Closed-form OLS on the log scale: slope = covar_pop / var_pop,
  * intercept = ȳ − slope·x̄ — ONE distributed aggregate over the fit rows,
  * then a broadcast of the 1-row coefficient frame back onto the data. No
  * iterative solver, no collect of data rows; at 100 TB this is a single
  * map-side-combined pass plus a broadcast join.
  *
  * Coefficients are rounded to 6 dp BEFORE use: covar/var accumulation
  * order differs between engines and partitionings, and rounding the two
  * scalars once makes every imputed value reproducible bit-for-bit.
  */
object Impute {

  /** Fill nulls in `yCol` with exp(intercept + slope·ln(x)) fitted on the
    * non-null rows; adds `outCol`, `was_imputed`, `slope`, `intercept`.
    * Requires positive xCol (and positive non-null yCol) for the logs. */
  def logLogImpute(df: DataFrame, xCol: String, yCol: String,
      outCol: String): DataFrame = {
    val lnx = log(col(xCol))
    val lny = log(col(yCol))
    val coefs = df.filter(col(yCol).isNotNull)
      .agg((covar_pop(lny, lnx) / var_pop(lnx)).as("slope_raw"),
        avg(lny).as("ybar"), avg(lnx).as("xbar"))
      .select(r6(col("slope_raw")).as("slope"),
        r6(col("ybar") - r6(col("slope_raw")) * col("xbar")).as("intercept"))
    df.crossJoin(broadcast(coefs))
      .withColumn(outCol,
        when(col(yCol).isNotNull, col(yCol))
          .otherwise(r6(exp(col("intercept") + col("slope") * lnx))))
      .withColumn("was_imputed", col(yCol).isNull.cast("int"))
  }
}
