package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Time feature helpers.
  *
  * Reference: netflow/FlowWordCreation.scala:88-92 (fractional hour) and
  * utilities/TimeUtilities.scala:8-15 (HH:MM:SS → seconds of day). Both are
  * plain column arithmetic here — no UDFs.
  */
object TimeFunctions {

  def fractionalHour(hour: Int, minute: Int, second: Int): Double =
    hour.toDouble + minute.toDouble / 60 + second.toDouble / 3600

  /** h + m/60 + s/3600 as a double column. */
  def fractional_hour(hour: Column, minute: Column, second: Column): Column =
    hour.cast("double") + minute.cast("double") / 60.0 + second.cast("double") / 3600.0

  def secondsOfDay(timeStr: String): Double = {
    val s = timeStr.split(":")
    (3600 * s(0).toInt + 60 * s(1).toInt + s(2).toInt).toDouble
  }

  /** "HH:MM:SS" string → seconds-of-day double column. */
  def seconds_of_day(time: Column): Column = {
    val parts = split(time, ":")
    (parts.getItem(0).cast("int") * 3600 +
      parts.getItem(1).cast("int") * 60 +
      parts.getItem(2).cast("int")).cast("double")
  }
}
