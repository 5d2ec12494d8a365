package graft.model

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, StandardCopyOption}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper

/** File-backed configuration-schema registry — the Spark-side incarnation
  * of the reference's `ConfigurationSchema` (controller.py:27-116) behind
  * the `register-schema` / `list-schemas` / `remove-schema` CLI commands
  * (cli.py:146-176): a JSON database (`schemas.json`) in the registry
  * directory maps schema name → schema filename; registering copies the
  * schema file into the directory, removing deletes both the entry and
  * the file. Driver-side by design (SURVEY §2.1 S6) — no Spark session
  * involved.
  */
final class ConfigRegistry(val dir: Path) {
  private val dbPath = dir.resolve("schemas.json")
  private val mapper = new ObjectMapper()

  /** The registry database: name → schema filename (empty if absent). */
  def db: Map[String, String] =
    if (!Files.exists(dbPath)) Map.empty
    else mapper.readValue(Files.readAllBytes(dbPath),
      classOf[java.util.LinkedHashMap[String, String]]).asScala.toMap

  private def write(m: Map[String, String]): Unit = {
    Files.createDirectories(dir)
    Files.write(dbPath, mapper.writeValueAsBytes(m.asJava))
  }

  /** Register `src` under `name`: copy the file into the registry dir and
    * record its filename (controller.py:72-90). Returns the stored
    * filename. */
  def register(name: String, src: Path): String = {
    Files.createDirectories(dir)
    val fname = src.getFileName.toString
    Files.copy(src, dir.resolve(fname), StandardCopyOption.REPLACE_EXISTING)
    write(db + (name -> fname))
    fname
  }

  /** Remove `name` from the database and delete its file
    * (controller.py:92-116). False if the name was not registered. */
  def remove(name: String): Boolean = db.get(name) match {
    case None => false
    case Some(fname) =>
      write(db - name)
      Files.deleteIfExists(dir.resolve(fname))
      true
  }

  /** Load a registered schema's content (controller.py:44-70). None if
    * the name is not registered. */
  def fetch(name: String): Option[String] =
    db.get(name).filter(f => Files.exists(dir.resolve(f)))
      .map(f => new String(Files.readAllBytes(dir.resolve(f)), UTF_8))
}
