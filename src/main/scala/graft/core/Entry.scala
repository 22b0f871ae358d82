package graft.core

import java.sql.Timestamp

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.Encoders

/** The canonical access-log record — the managed 14-column schema
  * (reference: ballcone/dao.py:74-91; DDL tools/monet2duck.py:58-75).
  * `Dataset[Entry]` with the product encoder replaces the reference's
  * NamedTuple + hand-rolled row codecs (dao.py:92-111) — round-tripping
  * is free.
  */
final case class Entry(
    datetime: Timestamp,              // TIMESTAMP NOT NULL, UTC
    host: String,                     // VARCHAR NOT NULL
    path: String,                     // VARCHAR NOT NULL (URL-decoded)
    status: Short,                    // SMALLINT NOT NULL
    length: Int,                      // INTEGER NOT NULL
    generation_time: Double,          // DOUBLE NOT NULL
    referer: Option[String],          // VARCHAR
    ip: String,                       // VARCHAR NOT NULL (IPv4/IPv6 text)
    country_iso_code: Option[String], // VARCHAR (GeoIP-derived)
    platform_name: Option[String],    // VARCHAR (UA-derived)
    platform_version: Option[String], // VARCHAR
    browser_name: Option[String],     // VARCHAR
    browser_version: Option[String],  // VARCHAR
    is_robot: Option[Boolean])        // BOOLEAN

object Entry {
  implicit val encoder: Encoder[Entry] = Encoders.product[Entry]
  val columns: Seq[String] = encoder.schema.fieldNames.toSeq
}
