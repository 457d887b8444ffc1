package graft.core.warc

import org.apache.hadoop.conf.Configuration

/** A serializable carrier for the session's Hadoop configuration, so
  * executor-side filesystem opens (WARC/WET readers and writers) honor
  * `spark.hadoop.*` settings — S3A credentials, GCS connectors, custom
  * endpoints — exactly like every built-in source/sink does. Opening
  * filesystems via `new Configuration()` silently drops all of that and
  * breaks on any store that needs configured credentials.
  *
  * `Configuration` itself is Writable but not Serializable; this wrapper
  * ships it through Java serialization (task closures / broadcasts) via
  * its Writable form — the same trick Spark uses internally.
  */
final class SerializableHadoopConf(@transient var value: Configuration) extends Serializable {

  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }

  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}
