package graft

import org.scalatest.funsuite.AnyFunSuite

/** The rotating-log analog ships as a classpath log4j2 config
  * (reference batch/logger.py:13-18: 10 MB x 5 RotatingFileHandler +
  * console, propagate=False). Pin the policy so the file can't drift
  * from the contract silently.
  */
class LoggingConfigSpec extends AnyFunSuite {

  private lazy val props: java.util.Properties = {
    val in = getClass.getResourceAsStream("/log4j2-graft.properties")
    assert(in != null, "log4j2-graft.properties missing from classpath")
    val p = new java.util.Properties()
    try p.load(in) finally in.close()
    p
  }

  test("rolling policy matches the reference: 10MB x 5 backups") {
    assert(props.getProperty("appender.rolling.policies.size.size") == "10MB")
    assert(props.getProperty("appender.rolling.strategy.max") == "5")
    assert(props.getProperty("appender.rolling.fileName").endsWith("/batch.log"))
  }

  test("graft loggers: INFO to file+console, additivity off") {
    assert(props.getProperty("logger.graft.name") == "graft")
    assert(props.getProperty("logger.graft.level") == "info")
    assert(props.getProperty("logger.graft.additivity") == "false")
    assert(props.getProperty("logger.graft.appenderRef.rolling.ref") == "rolling")
    assert(props.getProperty("logger.graft.appenderRef.console.ref") == "console")
  }

  test("config parses as a real log4j2 configuration") {
    val src = new org.apache.logging.log4j.core.config.ConfigurationSource(
      getClass.getResourceAsStream("/log4j2-graft.properties"))
    val ctx = new org.apache.logging.log4j.core.LoggerContext("graft-test")
    val cfg = new org.apache.logging.log4j.core.config.properties
      .PropertiesConfigurationFactory().getConfiguration(ctx, src)
    cfg.initialize()
    assert(cfg.getAppenders.containsKey("rolling"))
    assert(cfg.getAppenders.containsKey("console"))
    assert(cfg.getLoggers.containsKey("graft"))
  }
}
